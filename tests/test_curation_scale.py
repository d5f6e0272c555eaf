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


def test_mixture_sample_is_nested_and_deterministic(spark):
    """Raising a source's rate must strictly GROW its sample (the nested
    property that lets a pipeline re-weight a mixture without churning
    already-selected docs), and two runs must select identical docs."""
    lo = CU.curation_mixture_sample(spark, SF001,
                                    rates={}, default_rate=0.25)
    hi = CU.curation_mixture_sample(spark, SF001,
                                    rates={}, default_rate=0.5)
    lo_ids = {r.doc_id for r in lo.collect()}
    hi_ids = {r.doc_id for r in hi.collect()}
    assert lo_ids <= hi_ids and len(lo_ids) < len(hi_ids)
    again = {r.doc_id for r in CU.curation_mixture_sample(
        spark, SF001, rates={}, default_rate=0.25).collect()}
    assert again == lo_ids
    # the realized rate is near the target (hash uniformity sanity)
    total = spark.read.parquet(SF001 + "/documents.parquet").count()
    assert abs(len(lo_ids) / total - 0.25) < 0.08


def test_contamination_flags_known_overlaps(spark):
    """A corpus doc sharing an 8-gram with a benchmark doc must be
    flagged; construct certainty by checking against a brute-force
    python reference on the fixture corpus."""
    import pandas as pd

    got = {r.doc_id: (r.n_shared_ngrams, r.n_benchmark_docs)
           for r in CU.curation_contamination(
               spark, SF001, n=4, bench_mod=17).collect()}
    docs = pd.read_parquet(SF001 + "/documents.parquet")

    def grams(text, n=4):
        w = text.split(" ")
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    bench = {int(r.doc_id): grams(r.text)
             for r in docs.itertuples() if r.doc_id % 17 == 0}
    want = {}
    for r in docs.itertuples():
        if r.doc_id % 17 == 0:
            continue
        g = grams(r.text)
        shared = sum(len(g & bg) for bg in bench.values())
        ndocs = sum(1 for bg in bench.values() if g & bg)
        if shared:
            want[int(r.doc_id)] = (shared, ndocs)
    assert got == want and want


def test_split_is_deterministic_stable_and_independent(spark):
    """Split assignment is run-deterministic, exhaustive/disjoint by
    construction, stable under a growing train fraction (docs only move
    val->train), and statistically independent of the mixture-sample
    deviate (swapped hash constants)."""
    a = {r.doc_id: r.split
         for r in CU.curation_split(spark, SF001).collect()}
    b = {r.doc_id: r.split
         for r in CU.curation_split(spark, SF001).collect()}
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}
    frac_train = sum(1 for s in a.values() if s == "train") / len(a)
    assert 0.7 < frac_train < 0.9
    wider = {r.doc_id: r.split
             for r in CU.curation_split(spark, SF001,
                                        train=0.9, val=0.05).collect()}
    for doc, s in a.items():
        if s == "train":
            assert wider[doc] == "train"  # nested: train only grows
    # independence from the sampling deviate: the kept half of a 0.5
    # mixture sample should still be ~0.8 train, not skewed
    kept = {r.doc_id for r in CU.curation_mixture_sample(
        spark, SF001, rates={}, default_rate=0.5).collect()}
    kept_train = sum(1 for d in kept if a[d] == "train") / len(kept)
    assert 0.7 < kept_train < 0.9


def test_mixture_sample_boundary_matches_oracle(spark, tmp_path):
    """ADVICE r05: the keep/drop decision must use the RAW deviate (the
    SQL oracle's unrounded WHERE), not the rounded output column — a doc
    whose u lies within 5e-7 below a rate boundary was kept by DuckDB
    but dropped by Spark. The doc_ids below land u in exactly that flip
    zone for rate 0.25 (u in [0.2499995, 0.25), round6(u) == 0.250000)."""
    import duckdb
    import pandas as pd

    flip = [2563151, 3574991, 4586831]
    pd.DataFrame({
        "doc_id": flip + [1, 2, 3, 1000, 2000],
        "source": ["boundary"] * 8,
    }).to_parquet(tmp_path / "documents.parquet")
    rates = {"boundary": 0.25}
    got = CU.curation_mixture_sample(spark, str(tmp_path), rates=rates)
    kept = {r.doc_id for r in got.collect()}
    assert set(flip) <= kept, "flip-zone docs must be kept (raw u < rate)"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = {r[0] for r in con.execute(
        CU.sql_curation_mixture_sample(rates=rates)).fetchall()}
    assert kept == want
