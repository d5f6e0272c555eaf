"""Grouped-map (applyInPandas) and grouped-agg (pandas UDAF) operators —
the remaining rows of the UDF-surface matrix (SURVEY.md §2.5). Both have
exact SQL oracles so they run under the driver's value-hash gate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import read_table

SESSION_GAP_MIN = 30

_SESSION_SCHEMA = ("user_id long, n_sessions long, n_events long, "
                   "longest_session long")


def _sessionize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user sessionization: a new session starts when the gap since
    the previous event exceeds SESSION_GAP_MIN minutes."""
    pdf = pdf.sort_values(["ts", "event_id"])
    gaps = pdf["ts"].diff().dt.total_seconds().fillna(1e18)
    session_id = (gaps > SESSION_GAP_MIN * 60).cumsum()
    sizes = session_id.value_counts()
    return pd.DataFrame({
        "user_id": [pdf["user_id"].iloc[0]],
        "n_sessions": [int(session_id.nunique())],
        "n_events": [len(pdf)],
        "longest_session": [int(sizes.max())],
    })


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map: groupBy(user).applyInPandas — per-group imperative
    logic (session assignment) that window functions would need several
    passes to express; one Arrow crossing per user group."""
    e = read_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    return e.groupBy("user_id").applyInPandas(_sessionize, _SESSION_SCHEMA)


SQL_SESSIONIZE = f"""
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
),
sized AS (
  SELECT user_id, session_id, COUNT(*) AS sz
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(sz) AS BIGINT) AS n_events,
       CAST(MAX(sz) AS BIGINT) AS longest_session
FROM sized GROUP BY user_id
"""


from pyspark.sql.types import DoubleType  # noqa: E402


@F.pandas_udf(DoubleType())
def _weighted_avg(v: pd.Series, w: pd.Series) -> float:
    return float((v * w).sum() / w.sum())


def weighted_avg_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF: event value weighted by its JSON payload
    weight — Arrow-batched per group, no row-at-a-time Python."""
    e = read_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").alias("v"),
        F.get_json_object("props", "$.k").cast("double").alias("w"))
    return (e.groupBy("event_type")
            .agg(F.round(_weighted_avg("v", "w"), 6).alias("wavg")))


SQL_WEIGHTED_AVG = """
SELECT event_type,
       ROUND(SUM(value * CAST(JSON_EXTRACT_STRING(props, '$.k') AS DOUBLE))
             / SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS DOUBLE)), 6)
         AS wavg
FROM events GROUP BY event_type
"""
