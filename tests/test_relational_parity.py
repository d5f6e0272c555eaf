"""T4: every relational-corpus query vs its DuckDB oracle at sf0.01 —
mirrors the driver's CORRECTNESS gate (row count + column names +
order-insensitive exact values) so failures surface pre-submit."""

import pytest

from joint_entity_and_relation_extraction_spark.plans import queries as Q

from conftest import SF001
from parity_util import assert_matches_oracle, make_con


@pytest.fixture(scope="module")
def con():
    return make_con(SF001)


ORACLED = sorted(Q.RELATIONAL_ORACLE)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, con, name):
    assert_matches_oracle(
        name, Q.RELATIONAL_QUERIES[name](spark, SF001), con,
        Q.RELATIONAL_ORACLE[name])


NO_ORACLE = sorted(set(Q.RELATIONAL_QUERIES) - set(Q.RELATIONAL_ORACLE))


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_queries_run(spark, name):
    df = Q.RELATIONAL_QUERIES[name](spark, SF001)
    assert df.count() >= 0 and len(df.columns) > 0
