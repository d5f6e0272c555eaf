"""Registry-level mirror of the driver gate: analytics/dedup/similarity
queries vs their DuckDB oracles; rows-only queries run and return sane
shapes; entry() smoke check."""

import os

import pytest

import __spark_entry__ as entrymod
from joint_entity_and_relation_extraction_spark.plans import registry
from joint_entity_and_relation_extraction_spark.plans.queries import RELATIONAL_ORACLE

from conftest import SF001
from parity_util import assert_matches_oracle, driver_canon, make_con


@pytest.fixture(scope="module")
def con():
    return make_con(SF001)


# relational ones already covered in test_relational_parity.py
ANALYTIC_ORACLED = sorted(set(registry.all_oracles()) - set(RELATIONAL_ORACLE))


@pytest.mark.parametrize("name", ANALYTIC_ORACLED)
def test_analytics_matches_oracle(spark, con, name):
    assert_matches_oracle(
        name, registry.all_queries()[name](spark, SF001), con,
        registry.all_oracles()[name])


ROWS_ONLY = sorted(set(registry.all_queries()) - set(registry.all_oracles())
                   - {"sample_frac", "agg_approx_distinct"}
                   - {k for k in registry.all_queries() if k.startswith("kg_")})


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_analytics_run(spark, name):
    """The driver canonicalizes EVERY windowed query — including rows-only
    ones — via toPandas + row hashing, so a bare df.count() here is a
    weaker mirror than the gate it claims to mirror (that gap let the r03
    mm_media_features array<float> output through, VERDICT r03 #2). Run
    the driver's actual path: full toPandas, then hash+sort every row."""
    pdf = registry.all_queries()[name](spark, SF001).toPandas()
    cols, hashes = driver_canon(pdf)
    assert len(cols) > 0 and len(hashes) == len(pdf)


@pytest.mark.parametrize("name", sorted(registry.all_queries()))
def test_all_queries_canon_hashable(spark, name):
    """Permanent driver-canon audit (VERDICT r03 item 6) over ALL
    registered queries, not just the windowed 50 — a future window
    rotation can't resurface a non-hashable (list/dict/ndarray) output
    column. limit() keeps it cheap; unhashable cells are a property of
    the output SCHEMA, so any row exposes them."""
    pdf = registry.all_queries()[name](spark, SF001).limit(20).toPandas()
    driver_canon(pdf)  # raises TypeError on any non-scalar cell


def test_oracle_keys_subset_of_queries():
    assert set(registry.all_oracles()) <= set(registry.all_queries())


# Independent pinned copy of the r06 driver window (registry.WINDOW): a
# deliberate rotation edits BOTH files, so an accidental edit of either
# is loud — the exact-membership discipline that stopped the r02/r04
# silent evictions, carried into the explicit-window mechanism.
EXPECTED_WINDOW_R06 = [
    "kg_triple_metrics",
    "text_repetition", "text_unigram_logprob", "text_pii_scrub",
    "text_length_histogram", "text_ngram_topk",
    "curation_quality_filter", "curation_score_normalize",
    "curation_mixture_sample", "curation_contamination", "curation_split",
    "pack_manifest", "dedup_clusters_incremental",
    "graph_degrees", "graph_pagerank", "kg_entity_pagerank",
    "graph_degrees_lsh", "graph_pagerank_lsh",
    "agg_stats_funcs", "stream_interval_join_batch", "iceberg_cluster_scan",
    "join_lateral", "window_first_last", "iceberg_zorder_scan",
    "set_union_all", "set_intersect", "set_except", "distinct_rows",
    "string_funcs", "date_funcs", "math_funcs", "array_funcs",
    "json_funcs", "explode_array", "pivot_event_type",
    "set_union_distinct", "window_range_interval", "agg_grouping_sets",
    "map_funcs", "subquery_scalar", "conditional_funcs", "sort_nulls",
    "agg_salted_skew", "join_asof_agg", "stream_tumbling_batch",
    "join_salted", "iceberg_snapshot_scan", "udtf_word_pos",
    "agg_approx_distinct", "sample_frac",
]


def test_driver_window_covers_priority_queries():
    """The driver hash-checks only the first ~50 all_queries() entries
    (every CORRECTNESS file so far cut at exactly 50, in dict order).
    From r06 the window is the explicit registry.WINDOW list; assert the
    emitted prefix equals the independently pinned copy above."""
    window = list(registry.all_queries())[: registry.DRIVER_WINDOW]
    assert window == EXPECTED_WINDOW_R06, (
        f"driver window drifted:\n"
        f" evicted={sorted(set(EXPECTED_WINDOW_R06) - set(window))}\n"
        f" intruded={sorted(set(window) - set(EXPECTED_WINDOW_R06))}")


def test_every_query_driver_checked_within_3_rounds():
    """Stamp-age rotation rule (VERDICT r05 item 4): every registered
    query must either hold a driver row from one of the last 3 committed
    CORRECTNESS rounds or sit in the CURRENT window (which buys it a row
    this round) — old green stamps decay, because any refactor of the
    query plans silently invalidates them without driver re-verification.
    Computed from the committed CORRECTNESS_r0*.json files, so the rule
    self-schedules future rotations (e.g. the 12 queries last checked in
    r03 force themselves into the r07 window)."""
    import glob
    import json
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds: dict[int, set] = {}
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r0*(\d+)\.json$", f).group(1))
        with open(f) as fh:
            rounds[rnd] = set(json.load(fh))
    assert rounds, "no committed CORRECTNESS files found"
    newest = max(rounds)
    recent: set = set()
    for rnd, names in rounds.items():
        if rnd > newest - 3:
            recent |= names
    window = set(registry.WINDOW)
    stale = sorted(q for q in registry.all_queries()
                   if q not in recent and q not in window)
    assert not stale, (
        f"queries with no driver row in rounds >{newest - 3} and not in "
        f"the current window (hoist them): {stale}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(df.columns) == 7
    assert len(rows) >= 0


def test_kg_triple_metrics_perfect_vs_goldens(spark):
    """The north-rule witness at the small fixture: the Spark chain must
    reproduce the committed sf0.001 goldens exactly — P = R = F1 = 1.0
    with all three counts equal to the golden-file size."""
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "goldens", "triples_sf0001.json")) as f:
        n = len(json.load(f))
    row = registry.all_queries()["kg_triple_metrics"](
        spark, "/root/testdata/sf0.001").collect()[0]
    assert (row.n_golden, row.n_spark, row.n_match) == (n, n, n)
    assert row.precision == row.recall == row.f1 == 1.0
