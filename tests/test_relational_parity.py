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


def test_approx_distinct_within_rsd_bound(spark, con):
    """HLL++ can't hash-match an exact oracle, but it is not unchecked:
    each group's estimate must sit within ±3·rsd of DuckDB's exact
    COUNT(DISTINCT) (rsd=0.02 → ±6%) — a silent estimator regression now
    fails loudly (VERDICT.md item 6)."""
    got = {r.l_returnflag: r.approx_parts for r in
           Q.RELATIONAL_QUERIES["agg_approx_distinct"](spark, SF001).collect()}
    exact = dict(con.execute(
        "SELECT l_returnflag, COUNT(DISTINCT l_partkey) FROM lineitem "
        "GROUP BY l_returnflag").fetchall())
    assert set(got) == set(exact)
    for flag, est in got.items():
        lo, hi = exact[flag] * (1 - 0.06), exact[flag] * (1 + 0.06)
        assert lo <= est <= hi, (flag, est, exact[flag])


def test_sample_frac_subset_and_count_band(spark, con):
    """The seeded Bernoulli sampler's RNG differs across engines, but the
    sample must be (a) a true subset of the table and (b) sized within a
    generous binomial band around 0.1·n (±6σ) — a broken sampler (wrong
    fraction, duplicated rows, fabricated keys) now fails loudly."""
    from collections import Counter

    rows = Q.RELATIONAL_QUERIES["sample_frac"](spark, SF001).collect()
    got = Counter((r.l_orderkey, r.l_linenumber) for r in rows)
    # multiset-subset: (l_orderkey, l_linenumber) is not unique in the
    # synthetic lineitem, so compare per-key multiplicities
    table = Counter(con.execute(
        "SELECT l_orderkey, l_linenumber FROM lineitem").fetchall())
    assert all(table[k] >= c for k, c in got.items())
    n = sum(table.values())
    import math
    sigma = math.sqrt(n * 0.1 * 0.9)
    assert abs(sum(got.values()) - 0.1 * n) <= 6 * sigma, (sum(got.values()), n)


def test_sample_stratified_subset_and_per_stratum_bands(spark, con):
    """sampleBy must be a true multiset-subset per stratum and each
    stratum's count must sit within ±6σ of its own rate — a sampler that
    ignores strata (one global rate) or fabricates rows fails loudly."""
    import math
    from collections import Counter

    rates = {"A": 0.05, "N": 0.2, "R": 0.1}
    rows = Q.RELATIONAL_QUERIES["sample_stratified"](spark, SF001).collect()
    got = Counter((r.l_orderkey, r.l_linenumber, r.l_returnflag)
                  for r in rows)
    table = Counter(con.execute(
        "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem"
    ).fetchall())
    assert all(table[k] >= c for k, c in got.items())
    per_stratum = Counter(r.l_returnflag for r in rows)
    totals = dict(con.execute(
        "SELECT l_returnflag, COUNT(*) FROM lineitem GROUP BY 1").fetchall())
    for flag, p in rates.items():
        n = totals[flag]
        sigma = math.sqrt(n * p * (1 - p))
        assert abs(per_stratum[flag] - p * n) <= 6 * sigma, (
            flag, per_stratum[flag], p * n)


def test_approx_percentile_within_rank_error(spark, con):
    """GK-sketch percentiles can't hash-match exact SQL quantiles, but at
    accuracy=1000 the result must sit between the exact (p-eps) and
    (p+eps) quantiles with eps = 1/1000 (plus one value of slack at the
    discrete boundaries) — a broken sketch or wrong column fails loudly."""
    rows = {r.l_returnflag: r for r in
            Q.RELATIONAL_QUERIES["agg_approx_percentile"](spark, SF001)
            .collect()}
    eps = 1.0 / 1000
    for flag, r in rows.items():
        vals = [v for (v,) in con.execute(
            "SELECT CAST(l_extendedprice AS DOUBLE) FROM lineitem "
            f"WHERE l_returnflag = '{flag}' ORDER BY 1").fetchall()]
        n = len(vals)
        for p, got in ((0.25, r.p25), (0.50, r.p50), (0.95, r.p95)):
            lo = vals[max(0, int((p - eps) * n) - 1)]
            hi = vals[min(n - 1, int((p + eps) * n) + 1)]
            assert lo <= got <= hi, (flag, p, got, lo, hi)
