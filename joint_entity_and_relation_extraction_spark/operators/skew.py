"""Skew handling (BASELINE.json: "skew from hot domains/entities is
handled with salted repartitioning and AQE skew-join hints").

Two mechanisms, both semantics-preserving (property-tested salted ==
unsalted):

- salted two-phase aggregation: hot grouping keys (one domain holding 30%
  of a crawl) are spread over S salt buckets, partially aggregated per
  (key, salt) map-side, then finally combined per key — the classic fix
  when one reducer would own a hot key's entire partition;
- salted join: the skewed fact side gets a random-but-deterministic salt,
  the dimension side is exploded xS so every (key, salt) pair still
  matches. AQE's runtime skew-join split stays enabled in the session for
  the sort-merge cases it can see (session.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key: Column, buckets: int = 16,
              col_name: str = "__salt") -> DataFrame:
    """Deterministic salt derived from the full row's natural identity
    (xxhash64 of all columns) — stable across retries, unlike rand()."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*df.columns), F.lit(buckets)).cast("int"))


def salted_agg(df: DataFrame, key_cols: list[str], aggs: list,
               buckets: int = 16) -> DataFrame:
    """Two-phase aggregation for algebraic aggregates expressed as
    (partial_expr, combine_fn, alias) triples via ``salted_count_sum``-
    style helpers; here specialized to the common count/sum family:
    ``aggs`` is a list of (col, 'count'|'sum'|'min'|'max', alias)."""
    salted = with_salt(df, F.struct(*key_cols), buckets)
    partial_exprs, final_exprs = [], []
    for col, kind, alias in aggs:
        p = f"__p_{alias}"
        if kind == "count":
            partial_exprs.append(F.count(col).alias(p))
            final_exprs.append(F.sum(p).alias(alias))
        elif kind == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(alias))
        elif kind == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(alias))
        elif kind == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(alias))
        else:
            raise ValueError(f"unsupported agg kind {kind}")
    partial = salted.groupBy(*key_cols, "__salt").agg(*partial_exprs)
    return partial.groupBy(*key_cols).agg(*final_exprs)


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                buckets: int = 16) -> DataFrame:
    """Equi-join where ``fact`` is skewed on ``key``: fact rows get a salt,
    dim rows are replicated xbuckets, join key becomes (key, salt). Output
    columns = fact ∪ dim (like a plain inner join)."""
    f = with_salt(fact, F.col(key), buckets)
    salts = fact.sparkSession.range(buckets).select(
        F.col("id").cast("int").alias("__salt"))
    d = dim.crossJoin(F.broadcast(salts))
    out = f.join(d, [key, "__salt"])
    return out.drop("__salt")


def domain_of(url_col) -> Column:
    return F.regexp_extract(url_col, r"https?://([^/]+)/", 1)
