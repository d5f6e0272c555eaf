"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``joint_entity_and_relation_extraction_spark``;
this module only adapts it to the driver contract. Local mirror of the
same comparison: tests/test_relational_parity.py, tests/test_registry.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from joint_entity_and_relation_extraction_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: web pages → byte-stable
    text extraction → joint NER+RE inference → aggregated triples."""
    return registry.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data analytics ops)."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; keys absent
    here (model inference, LSH signatures, sampling) take the driver's
    rows-only check and are additionally pinned by pytest parity gates."""
    return registry.all_oracles()
