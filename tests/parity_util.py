"""Shared Spark-vs-DuckDB comparison mirroring the driver's correctness
check: row count + sorted column names + order-insensitive exact values."""

import math

import duckdb
import pandas as pd

from joint_entity_and_relation_extraction_spark.sources.io import TABLES, table_path


def make_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")
    return c


def _norm(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, pd.Timestamp):
        return ("ts", v.to_pydatetime().isoformat())
    if hasattr(v, "isoformat"):
        return ("ts", v.isoformat())
    return (type(v).__name__[:1], str(v))


def canon(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = [tuple(_norm(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows)


def driver_canon(pdf: pd.DataFrame):
    """Mirror of the driver's rows-only canonicalization: toPandas →
    per-row tuple HASH + sort. ``hash(tuple(row))`` raises
    ``TypeError: unhashable type`` on any list/dict/ndarray cell — the
    exact failure mode that produced the r03 ``mm_media_features`` driver
    ERROR (VERDICT r03 #1/#2). Every windowed rows-only query must pass
    through this before submit."""
    cols = sorted(pdf.columns)
    rows = [tuple(row)
            for row in pdf[cols].itertuples(index=False, name=None)]
    return cols, sorted(hash(r) for r in rows)


def assert_matches_oracle(name, spark_df, con, sql):
    got_df = spark_df.toPandas()
    want_df = con.execute(sql).df()
    assert len(got_df) == len(want_df), (
        f"{name}: rows {len(got_df)} vs {len(want_df)}")
    gc, gr = canon(got_df)
    wc, wr = canon(want_df)
    assert gc == wc, f"{name}: columns {gc} vs {wc}"
    if gr != wr:
        only_g = [r for r in gr if r not in set(wr)][:3]
        only_w = [r for r in wr if r not in set(gr)][:3]
        raise AssertionError(f"{name}: values differ; spark-only={only_g} "
                             f"oracle-only={only_w}")
