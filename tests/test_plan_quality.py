"""Physical-plan quality gates (SURVEY.md §4, task brief: ".explain the
plan and iterate until it's the plan you'd want"):

- filters and column projection reach the parquet scan (PushedFilters /
  ReadSchema);
- the dimension joins are BroadcastHashJoin, the big-big join is
  SortMergeJoin, the hint produces ShuffledHashJoin;
- IcebergLite manifest pruning keeps non-matching partition files out of
  the scan entirely;
- non-UDF operators run inside WholeStageCodegen;
- the salted-agg plan contains two aggregation levels (partial per salt).
"""

import pytest
from pyspark.sql import functions as F

from joint_entity_and_relation_extraction_spark.plans import queries as Q
from joint_entity_and_relation_extraction_spark.sources.io import read_table

from conftest import SF001


def plan_str(df, execute: bool = False) -> str:
    if execute:  # AQE: codegen spans only appear in the finalized plan;
        # must execute THIS df's own QueryExecution (count() builds a new one)
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushdown(spark):
    df = Q.RELATIONAL_QUERIES["filter_pushdown"](spark, SF001)
    p = plan_str(df)
    assert "PushedFilters:" in p
    assert "IsNotNull(l_shipdate)" in p or "GreaterThan(l_quantity" in p
    # projection pruning: the scan schema must not include unused columns
    assert "l_extendedprice" not in p.split("ReadSchema")[-1]


def test_scan_project_prunes_columns(spark):
    df = Q.RELATIONAL_QUERIES["scan_project"](spark, SF001)
    read_schema = plan_str(df).split("ReadSchema:")[-1]
    assert "l_orderkey" in read_schema
    assert "l_shipdate" not in read_schema and "l_returnflag" not in read_schema


def test_join_strategies_materialize_as_planned(spark):
    p = plan_str(Q.RELATIONAL_QUERIES["join_broadcast"](spark, SF001))
    assert "BroadcastHashJoin" in p
    p = plan_str(Q.RELATIONAL_QUERIES["join_sortmerge"](spark, SF001))
    assert "SortMergeJoin" in p
    p = plan_str(Q.RELATIONAL_QUERIES["join_shuffledhash"](spark, SF001))
    assert "ShuffledHashJoin" in p
    p = plan_str(Q.RELATIONAL_QUERIES["join_theta"](spark, SF001))
    assert "BroadcastNestedLoopJoin" in p


def test_semi_anti_joins(spark):
    p = plan_str(Q.RELATIONAL_QUERIES["join_semi"](spark, SF001))
    assert "LeftSemi" in p
    p = plan_str(Q.RELATIONAL_QUERIES["join_anti"](spark, SF001))
    assert "LeftAnti" in p


def test_whole_stage_codegen_on_agg(spark):
    p = plan_str(Q.RELATIONAL_QUERIES["agg_group_multi"](spark, SF001),
                 execute=True)
    assert "isFinalPlan=true" in p
    assert "*(" in p  # whole-stage-codegen stage markers
    # partial + final aggregation (map-side combine before the shuffle)
    assert "partial_sum" in p and p.count("HashAggregate") >= 2


def test_iceberglite_partition_pruning_excludes_files(spark, tmp_path):
    from joint_entity_and_relation_extraction_spark.sources import iceberglite as il

    root = str(tmp_path / "t")
    df = read_table(spark, SF001, "customer").withColumn(
        "seg", F.col("c_mktsegment"))
    il.append(df, root, ["seg"])
    pruned = il.read(spark, root, where={"seg": "BUILDING"})
    files = pruned.inputFiles()
    assert files and all("seg=BUILDING" in f for f in files)


def test_salted_agg_has_two_phases(spark):
    from joint_entity_and_relation_extraction_spark.operators import skew as SK

    wp = read_table(spark, SF001, "orders").select(
        F.col("o_orderstatus").alias("k"), F.col("o_totalprice").alias("v"))
    plan = plan_str(SK.salted_agg(wp, ["k"], [("v", "sum", "s")]))
    # per-(key,salt) partial agg and per-key final agg both appear
    assert plan.count("HashAggregate") >= 3  # partials + finals


def test_broadcast_in_linking_plan(spark):
    from joint_entity_and_relation_extraction_spark.operators import extract as X
    from joint_entity_and_relation_extraction_spark.operators import linking as L
    from joint_entity_and_relation_extraction_spark.operators.webpages import web_pages

    ext = X.lang_filter(X.extract_text(web_pages(spark, SF001)))
    m = X.mentions(X.infer(X.split_sentences(ext)))
    p = plan_str(L.link_mentions(m, L.alias_dict(spark, SF001)))
    assert "BroadcastHashJoin" in p  # resolution joins back via broadcast
