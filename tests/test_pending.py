"""Staged-pool gate (tests/test_registry.py's disciplines, applied one
round early): the PENDING pool is NOT registered (the current window is
full — registering would recreate the unchecked-pool pattern VERDICT
r03–r05 dinged), but every pending query must already clear the full
driver contract locally — DuckDB-oracle parity at sf0.001 AND the
driver's toPandas+hash canon path — so the next rotation is a mechanical
two-dict move, not new verification work. The r06 instance of this pool
(9 queries) registered in r07 via exactly this mechanism."""

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
    an oracle UNLESS it is declared rows-only by nature
    (registry.PENDING_ROWS_ONLY — signature/model-based, pinned by
    dedicated pytest parity instead), so nothing enters the next round
    rows-only that COULD be hash-checked."""
    registered = set(registry.all_queries())
    assert not set(registry.PENDING_QUERIES) & registered
    assert set(registry.PENDING_ORACLE) == (
        set(registry.PENDING_QUERIES) - registry.PENDING_ROWS_ONLY)
    assert registry.PENDING_ROWS_ONLY <= set(registry.PENDING_QUERIES)


@pytest.mark.parametrize("name", sorted(registry.PENDING_ORACLE))
def test_pending_matches_oracle(spark, con, name):
    assert_matches_oracle(
        name, registry.PENDING_QUERIES[name](spark, SF001), con,
        registry.PENDING_ORACLE[name])


@pytest.mark.parametrize("name", sorted(registry.PENDING_QUERIES))
def test_pending_canon_hashable(spark, name):
    """The driver canonicalizes windowed results via per-row tuple
    hashing; any list/dict/ndarray cell is a hard driver ERROR (the r03
    mm_media_features failure) — pin hashability BEFORE these enter the
    next window."""
    pdf = registry.PENDING_QUERIES[name](spark, SF001).limit(20).toPandas()
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


# --- pure-python property gate for the scrub coverage formula ---------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=200), min_size=1,
                max_size=40, unique=True),
       st.integers(min_value=2, max_value=12))
def test_lag_coverage_formula_equals_interval_union(positions, n):
    """substring_scrub_stats computes |union of [p, p+n) intervals| as
    n + sum(min(gap, n)) over sorted positions — one LAG window, no
    island materialization. Pin it against the brute-force interval
    union for arbitrary position sets and span widths."""
    ps = sorted(positions)
    formula = n + sum(min(b - a, n) for a, b in zip(ps, ps[1:]))
    brute = len({x for p in ps for x in range(p, p + n)})
    assert formula == brute


def test_scrub_stats_consistent_with_scrub_text(spark):
    """Cross-operator consistency: the accounting op's words_removed and
    the emission op's n_kept must describe the same removal — and a doc
    the spans fully cover is absent from the emitted corpus."""
    from joint_entity_and_relation_extraction_spark.operators import dedup as DD

    stats = {r.doc_id: r for r in
             DD.substring_scrub_stats(spark, SF001).collect()}
    text = {r.doc_id: r for r in
            DD.substring_scrub_text(spark, SF001).collect()}
    assert stats  # fixture has duplicated docs
    for doc_id, r in stats.items():
        if r.words_removed == r.n_words:
            assert doc_id not in text
        else:
            t = text[doc_id]
            assert t.n_kept == r.n_words - r.words_removed
            assert len(t.text_scrubbed.split(" ")) == t.n_kept


def test_propose_next_window_accounting():
    """The rotation planner must produce a full, duplicate-free window
    that seats every pending query and every stamp about to expire —
    the computation each rotation session copies into WINDOW verbatim.
    Must hold BOTH before and after the round's CORRECTNESS artifact is
    committed (the r06 form double-advanced the clock once the artifact
    landed — ADVICE r06 high)."""
    from joint_entity_and_relation_extraction_spark.plans import registry

    p = registry.propose_next_window()
    assert len(p["proposal"]) == registry.DRIVER_WINDOW
    assert len(set(p["proposal"])) == registry.DRIVER_WINDOW
    assert set(registry.PENDING_QUERIES) <= set(p["proposal"])
    assert set(p["expiring"]) <= set(p["proposal"])
    # expiring ⊆ registered, pending ∩ registered = ∅
    assert set(p["expiring"]) <= set(registry.all_queries())
    assert not set(p["pending"]) & set(registry.all_queries())
