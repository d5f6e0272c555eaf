"""Scale-safe curation variants vs their exact window forms (VERDICT r04
item 3): the sharded packing must be EXACTLY equal; the sketch-threshold
selection may differ only at the quota-boundary score."""

from joint_entity_and_relation_extraction_spark.operators import curation as CU

from conftest import SF001


def test_pack_sequences_sharded_equals_exact(spark):
    """Order-preserving range shards + two-level prefix sum telescope to
    the single-window prefix sum — every row identical."""
    exact = CU.pack_sequences(spark, SF001, budget=2048)
    sharded = CU.pack_sequences_sharded(spark, SF001, budget=2048,
                                        n_shards=8)
    a = sorted(map(tuple, exact.collect()))
    b = sorted(map(tuple, sharded.collect()))
    assert a == b


def test_pack_sequences_sharded_partitions_are_bounded(spark):
    """The point of the variant: no window partition spans a whole lang.
    With 8 shards over dense doc_ids each (lang, shard) group holds ~1/8
    of a language."""
    sharded = CU.pack_sequences_sharded(spark, SF001, n_shards=8)
    n_langs = sharded.select("lang").distinct().count()
    # reconstruct the shard key the operator used
    plan = sharded._jdf.queryExecution().analyzed().toString()
    assert "shard" in plan
    assert n_langs >= 2


def test_curation_select_sketch_differs_only_at_boundary(spark):
    """Containment bounds: every doc the exact form keeps with a score
    STRICTLY above its source's boundary score must be kept by the sketch
    form, and every sketch-kept doc must score >= the exact form's
    boundary score for that source (sketch selection never reaches below
    the quota boundary)."""
    exact = CU.curation_select(spark, SF001, frac=0.5).toPandas()
    sketch = CU.curation_select_sketch(spark, SF001, frac=0.5).toPandas()
    # per-source boundary = the LOWEST score the exact quota admitted
    boundary = exact.groupby("source")["q_score"].min().to_dict()
    kept_sketch = set(sketch["doc_id"])
    for _, r in exact.iterrows():
        if r["q_score"] > boundary[r["source"]]:
            assert r["doc_id"] in kept_sketch, (
                f"sketch dropped {r['doc_id']} scoring {r['q_score']} > "
                f"boundary {boundary[r['source']]} of {r['source']}")
    for _, r in sketch.iterrows():
        assert r["q_score"] >= boundary[r["source"]], (
            f"sketch kept {r['doc_id']} below the exact boundary")


def test_curation_select_sketch_quota_is_close(spark):
    """The sketch selection size stays within the per-source tie mass of
    the exact quota (it can only differ by docs tied at the boundary)."""
    exact = CU.curation_select(spark, SF001, frac=0.5)
    sketch = CU.curation_select_sketch(spark, SF001, frac=0.5)
    ne, ns = exact.count(), sketch.count()
    total = spark.read.parquet(SF001 + "/documents.parquet").count()
    assert abs(ns - ne) <= 0.1 * total


def test_pack_sequences_sharded_no_global_window(spark):
    """Plan gate: the sharded form's big window partitions by (lang,
    shard), never by lang alone."""
    df = CU.pack_sequences_sharded(spark, SF001)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the per-row running sum must key on both columns
    assert "shard" in plan
