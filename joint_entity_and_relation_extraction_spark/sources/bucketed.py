"""Bucketed-table layout for co-located joins (SURVEY.md §4.4).

At 100 TB the dominant recurring cost of the KG store is re-joining
corpus-sized tables on the same key (triples ⋈ entity attributes on
``subj``, mentions ⋈ resolutions on the surface hash). Writing both
sides bucketed on that key — same bucket count, hash-partitioned files,
sorted within buckets — lets every later equi-join run with ZERO
exchange: Spark matches bucket spec to the join's required distribution
and plans a shuffle-free sort-merge join (plan-gated in
tests/test_bucketed.py).

Scope notes: the in-memory session catalog keeps bucket metadata for the
session; on a real cluster the same two calls target the metastore /
Iceberg (bucket transforms) and persist across jobs. Bucket count is a
layout decision: pick ~(table size / 256 MB) rounded to a power of two,
identical on every table sharing the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   buckets: int = 8) -> None:
    """Materialize ``df`` as a bucketed+sorted table on ``key``. Every
    table written with the same (key, buckets) pair is join-co-located
    with this one."""
    (df.write.bucketBy(buckets, key).sortBy(key)
     .mode("overwrite").saveAsTable(table))


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Equi-join two co-bucketed tables on their bucket key — planned
    WITHOUT any Exchange when the bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
