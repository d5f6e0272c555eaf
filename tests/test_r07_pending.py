"""r06-late-addition staging gate (tests/test_registry.py's disciplines,
applied one round early): the R07_PENDING pool is NOT registered (the r06
window is exactly full — registering would recreate the unchecked-pool
pattern VERDICT r03–r05 dinged), but every pending query must already
clear the full driver contract locally — DuckDB-oracle parity at sf0.001
AND the driver's toPandas+hash canon path — so the r07 rotation is a
mechanical two-dict move, not new verification work."""

import pytest

from joint_entity_and_relation_extraction_spark.plans import registry

from conftest import SF001
from parity_util import assert_matches_oracle, driver_canon, make_con


@pytest.fixture(scope="module")
def con():
    return make_con(SF001)


def test_pending_pool_is_staged_not_registered():
    """Staging discipline: pending names must be absent from
    all_queries() (a registered query needs a WINDOW seat in the round it
    is written — CLAUDE.md invariant) and every pending query must carry
    an oracle, so nothing enters r07 rows-only that could be hash-checked."""
    registered = set(registry.all_queries())
    assert not set(registry.R07_PENDING_QUERIES) & registered
    assert set(registry.R07_PENDING_ORACLE) == set(registry.R07_PENDING_QUERIES)


@pytest.mark.parametrize("name", sorted(registry.R07_PENDING_QUERIES))
def test_pending_matches_oracle(spark, con, name):
    assert_matches_oracle(
        name, registry.R07_PENDING_QUERIES[name](spark, SF001), con,
        registry.R07_PENDING_ORACLE[name])


@pytest.mark.parametrize("name", sorted(registry.R07_PENDING_QUERIES))
def test_pending_canon_hashable(spark, name):
    """The driver canonicalizes windowed results via per-row tuple
    hashing; any list/dict/ndarray cell is a hard driver ERROR (the r03
    mm_media_features failure) — pin hashability BEFORE these enter the
    r07 window."""
    pdf = registry.R07_PENDING_QUERIES[name](spark, SF001).limit(20).toPandas()
    cols, hashes = driver_canon(pdf)
    assert len(cols) > 0


def test_substring_spans_detects_known_duplicate(spark):
    """Property anchor independent of the oracle: two docs sharing an
    exact 8-word span are both reported, with dup_grams >= 1 and
    n_words == n_grams + 7."""
    from joint_entity_and_relation_extraction_spark.operators import dedup as DD

    rows = {r.doc_id: r for r in
            DD.substring_dup_spans(spark, SF001).collect()}
    assert len(rows) >= 2
    for r in rows.values():
        assert r.dup_grams >= 1
        assert r.n_words == r.n_grams + DD.SUBSTR_N - 1
        assert 0.0 < r.dup_frac <= 1.0


def test_substring_scrub_bounds(spark):
    """words_removed covers at least one full span (n words) and never
    exceeds the doc; overlapping spans shrink, never grow, the removal
    (words_removed <= dup_positions * n)."""
    from joint_entity_and_relation_extraction_spark.operators import dedup as DD

    n = DD.SUBSTR_N
    for r in DD.substring_scrub_stats(spark, SF001).collect():
        assert n <= r.words_removed <= r.n_words
        assert r.words_removed <= r.dup_positions * n
        assert 0.0 <= r.kept_frac < 1.0
