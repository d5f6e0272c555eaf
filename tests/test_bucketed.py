"""Co-located bucketed joins (SURVEY.md §4.4): writing both sides
bucketed on the join key must remove every Exchange from the join plan,
and the join must be exactly equal to the plain shuffled join."""

import re

import pytest
from pyspark.sql import functions as F

from joint_entity_and_relation_extraction_spark.sources import bucketed as B
from joint_entity_and_relation_extraction_spark.sources.io import read_table

from conftest import SF0001


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # managed tables land in ./spark-warehouse (gitignored; warehouse.dir
    # is a static conf, unchangeable on the shared session) and are
    # dropped — data included — in teardown
    docs = read_table(spark, SF0001, "documents").select("doc_id", "lang")
    emb = (read_table(spark, SF0001, "embeddings")
           .select(F.col("vec_id").alias("doc_id"), "label"))
    B.write_bucketed(docs, "b_docs", "doc_id", buckets=4)
    B.write_bucketed(emb, "b_emb", "doc_id", buckets=4)
    yield "b_docs", "b_emb"
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_emb")


def test_bucketed_join_has_zero_exchanges(spark, bucketed_tables):
    ta, tb = bucketed_tables
    bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = B.bucketed_join(spark, ta, tb, "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"Exchange", plan)) == 0, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)


def test_bucketed_join_equals_plain_join(spark, bucketed_tables):
    ta, tb = bucketed_tables
    got = sorted(map(tuple, B.bucketed_join(spark, ta, tb, "doc_id")
                     .collect()))
    docs = read_table(spark, SF0001, "documents").select("doc_id", "lang")
    emb = (read_table(spark, SF0001, "embeddings")
           .select(F.col("vec_id").alias("doc_id"), "label"))
    want = sorted(map(tuple, docs.join(emb, "doc_id").collect()))
    assert got == want and len(got) > 0
