"""Independent anchors for the r07 staged operators (python mirrors and
structural properties — the DuckDB parity half lives in test_pending.py).
Every mirror recomputes the semantics from the raw parquet with numpy/
pure python, so a shared misunderstanding between the Spark form and the
SQL oracle can't pass silently."""

import math

import pyarrow.parquet as pq
import pytest

from joint_entity_and_relation_extraction_spark.operators import curation as CU
from joint_entity_and_relation_extraction_spark.operators import dedup as DD
from joint_entity_and_relation_extraction_spark.operators import textstats as TS

from conftest import SF001


def _docs():
    t = pq.read_table(SF001 + "/documents.parquet",
                      columns=["doc_id", "text", "n_chars", "source"])
    return {r["doc_id"]: r for r in t.to_pylist()}


def test_bigram_logprob_matches_python_mirror(spark):
    """Full-value mirror: interpolated bigram LM recomputed in pure
    python over the same corpus; every (n_bigrams, avg_neg_log2p) must
    agree to the 1e-6 rounding the operator publishes."""
    docs = _docs()
    uni: dict = {}
    big: dict = {}
    tot = 0
    for r in docs.values():
        ws = (r["text"] or "").split(" ")
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
            tot += 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    lam = TS.BIGRAM_LAMBDA
    expected = {}
    for doc_id, r in docs.items():
        ws = (r["text"] or "").split(" ")
        if len(ws) < 2:
            continue
        nlps = [-math.log2(lam * big[(a, b)] / uni[a]
                           + (1 - lam) * uni[b] / tot)
                for a, b in zip(ws, ws[1:])]
        expected[doc_id] = (len(nlps), round(sum(nlps) / len(nlps), 6))
    got = {r.doc_id: (r.n_bigrams, r.avg_neg_log2p)
           for r in TS.bigram_logprob(spark, SF001).collect()}
    assert set(got) == set(expected)
    for doc_id, (n, v) in expected.items():
        gn, gv = got[doc_id]
        assert gn == n
        assert abs(gv - v) < 2e-6, (doc_id, gv, v)


def test_zipf_slope_matches_numpy_fit(spark):
    """The regr_* aggregate fit must equal numpy's least-squares line on
    the same (log2 rank, log2 count) points, and the slope of a natural-
    ish corpus must be negative."""
    import numpy as np

    docs = _docs()
    counts: dict = {}
    for r in docs.values():
        for w in (r["text"] or "").split(" "):
            counts[w] = counts.get(w, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    top = top[:TS.ZIPF_TOP_N]
    x = np.log2(np.arange(1, len(top) + 1, dtype=float))
    y = np.log2(np.array([c for _, c in top], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    row = TS.zipf_slope(spark, SF001).collect()[0]
    assert row.n_points == len(top)
    assert abs(row.zipf_slope - slope) < 1e-5
    assert abs(row.zipf_intercept - intercept) < 1e-5
    assert row.zipf_slope < 0
    assert 0.0 <= row.zipf_r2 <= 1.0


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_verify_distances_match_python(spark):
    """Every emitted pair's edit_dist must equal a reference Levenshtein
    on the same prefixes, exact-duplicate docs must verify at distance
    0 / similarity 1, and the max_dist filter must hold."""
    docs = _docs()
    rows = DD.edit_verify_pairs(spark, SF001).collect()
    assert rows, "fixture corpus contains near-dup pairs"
    n = DD.EDIT_PREFIX
    for r in rows:
        a = (docs[r.d1]["text"] or "")[:n]
        b = (docs[r.d2]["text"] or "")[:n]
        d = _lev(a, b)
        assert r.edit_dist == d, (r.d1, r.d2, r.edit_dist, d)
        assert r.edit_dist <= 40
        sim = round(1.0 - d / max(len(a), len(b)), 6)
        assert abs(r.edit_sim - sim) < 1e-9
        # identical prefixes must verify at exactly 0 / 1.0 (the exact
        # duplicates in the fixture have EMPTY text, so they never enter
        # the shingle candidate join — the zero case is pinned on equal
        # prefixes instead)
        if a == b:
            assert r.edit_dist == 0 and r.edit_sim == 1.0


def test_domain_cap_caps_and_ranks(spark):
    """Structural properties: every domain keeps <= cap docs, ranks are
    contiguous from 1 in n_chars-desc order, no domain retains its
    'www.' prefix, and the kept set per domain is exactly the top-cap
    by (n_chars desc, doc_id)."""
    docs = _docs()
    cap = 5
    rows = CU.domain_cap(spark, SF001, cap=cap).collect()
    by_dom: dict = {}
    for r in rows:
        assert not r.domain.startswith("www.")
        assert r.domain.endswith((".example.com", ".example.org"))
        by_dom.setdefault(r.domain, []).append(r)
    # python mirror of the synthetic url + cap rule
    expected: dict = {}
    for doc_id, d in docs.items():
        tld = ".org" if doc_id % 4 == 0 else ".com"
        dom = f"{d['source']}.example{tld}"
        expected.setdefault(dom, []).append((-d["n_chars"], doc_id))
    for dom, got in by_dom.items():
        assert len(got) <= cap
        assert sorted(r.rk for r in got) == list(range(1, len(got) + 1))
        want = [doc_id for _, doc_id in sorted(expected[dom])[:cap]]
        assert sorted(r.doc_id for r in got) == sorted(want)
    assert set(by_dom) == set(expected)


def test_metadata_snapshots_history_shape(spark):
    """The scripted lifecycle's literal history, re-asserted from the
    DataFrame (the oracle half is in test_pending.py): operations in
    order, the WAP-staged-but-unpublished snapshot flagged, the current
    pointer on the published snapshot."""
    from joint_entity_and_relation_extraction_spark.plans import queries as QQ

    rows = sorted(QQ.q_iceberg_metadata_snapshots(spark, SF001).collect(),
                  key=lambda r: r.id)
    assert [r.operation for r in rows] == [
        "append", "append", "compact", "rollback", "append", "append"]
    assert [r.staged for r in rows] == [False] * 5 + [True]
    assert [r.is_current for r in rows].count(True) == 1
    assert rows[4].is_current  # the published WAP snapshot, not the later staged one
    assert rows[3].n_added == 0 and rows[3].n_units == 2  # rollback adds nothing


def test_funnel_steps_monotone_and_ordered(spark):
    """Funnel counts must be monotone non-increasing by construction
    (each step conditions on reaching the previous one), and a python
    mirror over the raw events must agree exactly."""
    from joint_entity_and_relation_extraction_spark.plans import queries as QQ

    got = {r.step: (r.name, r.n_users)
           for r in QQ.q_funnel_steps(spark, SF001).collect()}
    assert [got[i][0] for i in (1, 2, 3)] == [
        "view", "click_after_view", "purchase_after_click"]
    n1, n2, n3 = (got[i][1] for i in (1, 2, 3))
    assert n1 >= n2 >= n3 >= 0 and n1 > 0
    ev = pq.read_table(SF001 + "/events.parquet",
                       columns=["user_id", "event_type", "ts"]).to_pylist()
    by_user: dict = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append(e)
    c1 = c2 = c3 = 0
    for rows in by_user.values():
        t1 = min((e["ts"] for e in rows if e["event_type"] == "view"),
                 default=None)
        if t1 is None:
            continue
        c1 += 1
        t2 = min((e["ts"] for e in rows
                  if e["event_type"] == "click" and e["ts"] >= t1),
                 default=None)
        if t2 is None:
            continue
        c2 += 1
        t3 = min((e["ts"] for e in rows
                  if e["event_type"] == "purchase" and e["ts"] >= t2),
                 default=None)
        if t3 is not None:
            c3 += 1
    assert (n1, n2, n3) == (c1, c2, c3)


def test_graph_triangles_match_python(spark):
    """Triangle counts recomputed by brute force over the (tiny) fixture
    pair graph: per-node counts must match exactly, and every count must
    be consistent with the node's clique membership lower bound."""
    from itertools import combinations

    from joint_entity_and_relation_extraction_spark.operators import dedup as DDx
    from joint_entity_and_relation_extraction_spark.operators import graph as G

    pairs = {(r.d1, r.d2) for r in
             DDx.ngram_jaccard_pairs(spark, SF001, n=2, threshold=0.2)
             .select("d1", "d2").collect()}
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected: dict = {}
    for node, nbrs in adj.items():
        t = sum(1 for u, v in combinations(sorted(nbrs), 2)
                if v in adj.get(u, ()))
        if t:
            expected[node] = t
    got = {r.doc_id: r.n_triangles for r in
           G.graph_triangles(spark, SF001).collect()}
    assert got == expected
    assert got, "fixture pair graph contains at least one triangle"


def test_tpch_q5_covers_all_asia_nations(spark):
    """Sanity anchor independent of the oracle: every ASIA nation with
    qualifying orders appears, revenue strictly positive, ordered desc."""
    from joint_entity_and_relation_extraction_spark.plans import queries as QQ

    rows = QQ.q_tpch_q5(spark, SF001).collect()
    assert rows
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert all(r.revenue > 0 for r in rows)
    assert len({r.n_name for r in rows}) == len(rows)


def test_edit_verify_lsh_equals_ngram_form(spark):
    """The LSH-candidate edit verify must emit the same verified pair
    set as the oracled ngram-candidate form on the fixture (where LSH
    recall is full) — the same equality pin the graph _lsh variants
    carry."""
    a = {(r.d1, r.d2, r.edit_dist)
         for r in DD.edit_verify_pairs(spark, SF001).collect()}
    b = {(r.d1, r.d2, r.edit_dist)
         for r in DD.edit_verify_pairs_lsh(spark, SF001).collect()}
    assert a == b and a


def test_graph_triangles_lsh_equals_ngram_form(spark):
    """LSH edge-base triangle counts equal the oracled ngram form on the
    fixture (full LSH recall there) — same pin as the degrees/pagerank
    _lsh variants."""
    from joint_entity_and_relation_extraction_spark.operators import graph as G

    a = {(r.doc_id, r.n_triangles)
         for r in G.graph_triangles(spark, SF001).collect()}
    b = {(r.doc_id, r.n_triangles)
         for r in G.graph_triangles_lsh(spark, SF001).collect()}
    assert a == b and a
