"""T5 (skew part): salted aggregation/join are semantics-preserving on the
deterministically skewed corpus (30% of pages on src0 at skew=True)."""

from pyspark.sql import functions as F

from joint_entity_and_relation_extraction_spark.operators import skew as SK
from joint_entity_and_relation_extraction_spark.operators.webpages import web_pages
from joint_entity_and_relation_extraction_spark.sources.io import read_table

from conftest import SF0001


def test_skew_knob_creates_hot_domain(spark):
    wp = web_pages(spark, SF0001, skew=True)
    counts = {r.domain: r["count"] for r in wp.select(
        SK.domain_of(F.col("url")).alias("domain")).groupBy("domain")
        .count().collect()}
    total = sum(counts.values())
    assert counts["src0.example.com"] >= 0.25 * total


def test_salted_agg_equals_plain_agg(spark):
    wp = web_pages(spark, SF0001, skew=True).select(
        SK.domain_of(F.col("url")).alias("domain"),
        F.length("html").alias("n"))
    plain = {(r.domain, r.n_rows, r.sum_n, r.max_n) for r in
             wp.groupBy("domain").agg(
                 F.count("n").alias("n_rows"), F.sum("n").alias("sum_n"),
                 F.max("n").alias("max_n")).collect()}
    salted = {(r.domain, r.n_rows, r.sum_n, r.max_n) for r in
              SK.salted_agg(wp, ["domain"],
                            [("n", "count", "n_rows"), ("n", "sum", "sum_n"),
                             ("n", "max", "max_n")]).collect()}
    assert salted == plain


def test_salted_join_equals_plain_join(spark):
    li = read_table(spark, SF0001, "lineitem")
    # make a skewed fact: everything mapped onto few supplier keys
    fact = li.select((F.col("l_suppkey") % 3).alias("s_key"), "l_orderkey",
                     "l_quantity")
    dim = read_table(spark, SF0001, "supplier").select(
        (F.col("s_suppkey") % 3).alias("s_key"), "s_name").dropDuplicates(["s_key"])
    plain = {tuple(r) for r in fact.join(dim, "s_key").collect()}
    salted = {tuple(r) for r in SK.salted_join(fact, dim, "s_key").collect()}
    assert salted == plain and len(plain) > 0
