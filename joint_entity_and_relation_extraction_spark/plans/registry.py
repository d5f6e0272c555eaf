"""Master registry: every implemented operator as a named (query, oracle)
pair — the single source for ``__spark_entry__.py`` and the local T4
mirror tests. Keys without an oracle entry are non-SQL-expressible (model
inference, LSH signatures, sampling) and get the driver's rows-only check.
"""

from __future__ import annotations

import json
import os
from functools import partial

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import curation as CU
from ..operators import dedup as DD
from ..operators import extract as X
from ..operators import graph as GR
from ..operators import multimodal as MM
from ..operators import pandas_ops as PO
from ..operators import similarity as SIM
from ..operators import textstats as TS
from ..operators.webpages import web_pages
from . import queries as QQ
from .queries import RELATIONAL_ORACLE, RELATIONAL_QUERIES


# --- KG pipeline stage queries (rows-only: DuckDB cannot run the
#     extractor/model; correctness is pinned by the oracle-parity pytest
#     gates T1–T3 instead) ---------------------------------------------------

def q_kg_web_pages(spark, sf):
    return web_pages(spark, sf).select("url", "warc_ts", "lang",
                                       F.length("html").alias("n_html_bytes"))


def q_kg_extract_text(spark, sf):
    return X.extract_text(web_pages(spark, sf)).select(
        "url", "warc_ts", "lang", "text_sha", "n_chars")


def q_kg_sentences(spark, sf):
    ext = X.lang_filter(X.extract_text(web_pages(spark, sf)))
    return X.split_sentences(ext).select(
        "url", "sent_id", "char_start", "char_end",
        F.size("tokens").cast("int").alias("n_tokens"))


_INFER_CACHE: dict = {}


def _inferred(spark, sf):
    """Persisted-and-memoized inference results per (application, sf_dir):
    several kg_* queries share the expensive extract→infer prefix; the
    driver runs them back-to-back in one session, so recomputing the
    model stage per query would triple its correctness-run cost.

    Keyed by applicationId, not id(spark): a stopped session's id() can be
    reused by a new SparkSession, which would hand back a DataFrame bound
    to a dead context. Entries from other applications are evicted (and
    their cached blocks dropped if the context is still alive) so the
    cache never outlives one driver run; clear_caches() is the explicit
    hook for callers that finish early."""
    app = spark.sparkContext.applicationId
    key = (app, sf)
    if key not in _INFER_CACHE:
        for old_key, df in list(_INFER_CACHE.items()):
            if old_key[0] != app:
                try:
                    df.unpersist()
                except Exception:
                    pass  # context already gone — nothing to release
                del _INFER_CACHE[old_key]
        ext = X.lang_filter(X.extract_text(web_pages(spark, sf)))
        _INFER_CACHE[key] = X.infer(X.split_sentences(ext)).persist()
    return _INFER_CACHE[key]


def clear_caches() -> None:
    """Unpersist and drop every memoized inference DataFrame."""
    for df in _INFER_CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass
    _INFER_CACHE.clear()


def q_kg_mentions(spark, sf):
    return X.mentions(_inferred(spark, sf))


def q_kg_triples_raw(spark, sf):
    return X.triples_raw(_inferred(spark, sf))


def q_kg_links(spark, sf):
    from ..operators import linking as LK

    inferred = _inferred(spark, sf)
    return LK.link_mentions(X.mentions(inferred), LK.alias_dict(spark, sf))


def q_kg_canonical_triples(spark, sf):
    from ..operators import canonicalize as C
    from ..operators import linking as LK

    inferred = _inferred(spark, sf)
    surfaces = (X.mentions(inferred).select("surface").distinct()
                .select(LK.normalize_col(F.col("surface")).alias("alias_norm"))
                .distinct())
    resolution = LK.resolve_surfaces(surfaces, LK.alias_dict(spark, sf))
    labels = C.connected_components(LK.resolution_edges(resolution))
    canon = C.canonical_triples_by_surface(
        X.triples_raw(inferred), C.surface_canon_map(resolution, labels))
    return (
        canon.groupBy("subj", "pred", "obj")
        .agg(F.min("subj_norm").alias("subj_name"),
             F.min("obj_norm").alias("obj_name"),
             F.count("*").alias("evidence_count"),
             F.countDistinct("url").alias("n_sources"))
    )


def q_kg_entity_pagerank(spark, sf):
    """Entity centrality of the constructed knowledge graph: PageRank
    over the symmetrized (subj, obj) edge set of the canonical triples
    — the analytics pass a KG consumer runs first (which entities
    anchor the graph). Symmetrized on purpose: pagerank_edges derives
    the node set from out-degrees, so undirected co-occurrence
    centrality is the well-defined form for an edge list where many
    entities only ever appear as objects. Model-backed input → driver
    rows-only; the PageRank math itself is reference-pinned in
    tests/test_graph.py."""
    from ..operators.graph import _sym_edges, pagerank_edges

    triples = q_kg_canonical_triples(spark, sf)
    pairs = (triples.filter(F.col("subj") != F.col("obj"))
             .select(F.col("subj").alias("d1"), F.col("obj").alias("d2"),
                     F.lit(1.0).alias("jaccard"))
             .dropDuplicates(["d1", "d2"])
             .localCheckpoint(eager=False))
    return (pagerank_edges(_sym_edges(pairs), iters=5)
            .select(F.col("id").alias("entity_id"), "pagerank"))


#: repo root (registry.py lives at <repo>/<pkg>/plans/registry.py) — the
#: committed goldens anchor kg_triple_metrics
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

#: strict-match triple identity (oracle/pipeline_local.triple_keys):
#: evidence location + surfaces + labels + predicate
_TRIPLE_KEY_COLS = ["url", "sent_id", "subj_surface", "subj_label",
                    "pred", "obj_surface", "obj_label"]


def q_kg_triple_metrics(spark, sf):
    """Triple-level P/R/F1 of the Spark extraction chain vs the COMMITTED
    single-process oracle goldens (VERDICT r05 item 6): the north rule
    gates Triple P/R >= 0.95 against the reference (BASELINE.json), the
    pytest parity gates pin exact equality — this query exposes the same
    fact as a driver-hashable one-row aggregate. The engine reproduces
    the goldens exactly, so the DuckDB oracle states that expectation
    directly: n_golden counted from the committed golden file,
    P = R = F1 = 1.0, all three counts equal.

    Scale shape: goldens are eval-benchmark sized (thousands of strict
    keys — the corpus scales at 100 TB, the benchmark does not), so the
    driver-side JSON load is bounded by construction; one full-outer
    join on the 7-column strict key + one aggregate touches the Spark
    triple stream exactly once."""
    tag = os.path.basename(sf.rstrip(os.sep)).replace(".", "")
    path = os.path.join(_REPO_ROOT, "goldens", f"triples_{tag}.json")
    with open(path) as f:
        rows = [tuple(r) for r in json.load(f)]
    g = spark.createDataFrame(
        rows, "url string, sent_id int, subj_surface string, "
        "subj_label string, pred string, obj_surface string, "
        "obj_label string").withColumn("_g", F.lit(1))
    t = (X.triples_raw(_inferred(spark, sf)).select(*_TRIPLE_KEY_COLS)
         .dropDuplicates().withColumn("_s", F.lit(1)))
    # eqNullSafe on every key column (ADVICE r06 low): a NULL key field
    # on either side must still match its counterpart, not silently
    # deflate n_match. Spark turns a conjunction of null-safe equalities
    # into a normal equi-join (SortMergeJoin on coalesced keys), so the
    # plan shape is unchanged; coalesce() collapses the duplicated key
    # columns a Column-expression join leaves behind.
    cond = None
    for c in _TRIPLE_KEY_COLS:
        e = t[c].eqNullSafe(g[c])
        cond = e if cond is None else cond & e
    j = t.join(g, cond, "full_outer").select(
        *[F.coalesce(t[c], g[c]).alias(c) for c in _TRIPLE_KEY_COLS],
        "_s", "_g")
    return (
        j.agg(F.count("_g").cast("bigint").alias("n_golden"),
              F.count("_s").cast("bigint").alias("n_spark"),
              F.count(F.when(F.col("_g").isNotNull()
                             & F.col("_s").isNotNull(), 1))
              .cast("bigint").alias("n_match"))
        .select("n_golden", "n_spark", "n_match",
                F.round(F.col("n_match") / F.col("n_spark"), 6)
                .alias("precision"),
                F.round(F.col("n_match") / F.col("n_golden"), 6)
                .alias("recall"),
                F.round(2 * F.col("n_match")
                        / (F.col("n_spark") + F.col("n_golden")), 6)
                .alias("f1")))


KG_QUERIES = {
    "kg_web_pages": q_kg_web_pages,
    "kg_extract_text": q_kg_extract_text,
    "kg_sentences": q_kg_sentences,
    "kg_mentions": q_kg_mentions,
    "kg_triples_raw": q_kg_triples_raw,
    "kg_links": q_kg_links,
    "kg_canonical_triples": q_kg_canonical_triples,
    # new in r06 (VERDICT r05 item 6) — windowed in its own round
    "kg_triple_metrics": q_kg_triple_metrics,
}

KG_ORACLE = {
    # The driver (and the pytest mirror) grade at sf0.01, so the oracle
    # counts the sf0.01 golden file; it asserts the EXPECTATION the
    # north rule sets (exact reproduction of the reference goldens), so
    # a hash-green row IS the driver-visible P=R=1.0 evidence. The other
    # kg_* stages stay rows-only (DuckDB cannot run the model).
    "kg_triple_metrics": f"""
WITH g AS (SELECT COUNT(*) AS n
           FROM read_json('{_REPO_ROOT}/goldens/triples_sf001.json',
                          format='array', records=false))
SELECT CAST(n AS BIGINT) AS n_golden,
       CAST(n AS BIGINT) AS n_spark,
       CAST(n AS BIGINT) AS n_match,
       CAST(1.0 AS DOUBLE) AS "precision",
       CAST(1.0 AS DOUBLE) AS recall,
       CAST(1.0 AS DOUBLE) AS f1
FROM g
""",
}


# --- dedup / similarity / text analysis / multimodal ------------------------

ANALYTICS_QUERIES = {
    "dedup_exact": DD.exact_dedup_groups,
    "dedup_ngram_jaccard": partial(DD.ngram_jaccard_pairs, n=2, threshold=0.2),
    "dedup_minhash_lsh": partial(DD.minhash_lsh_pairs, n=2, threshold=0.2),
    "dedup_simhash": partial(DD.simhash_pairs, max_hamming=3),
    "dedup_embedding_cosine": partial(DD.embedding_neardup_pairs, threshold=0.3),
    "dedup_clusters": partial(DD.neardup_clusters, n=2, threshold=0.2),
    "emb_label_centroids": SIM.label_centroids,
    "ann_topk_bruteforce": partial(SIM.ann_bruteforce, n_queries=8, k=5),
    "ann_topk_lsh": partial(SIM.ann_lsh, n_queries=8, k=5),
    "ann_topk_ivf": partial(SIM.ann_ivf, n_queries=8, k=5),
    "text_token_stats": TS.token_stats,
    "text_quality": TS.quality_scores,
    "text_langid_scores": TS.langid_scores,
    "text_langid_predict": TS.langid_predict,
    "text_fingerprint": TS.fingerprint,
    "text_winnow_fingerprint": TS.winnow_fingerprint,
    "dedup_winnow_pairs": partial(DD.winnow_pairs, k=5, w=8, min_common=2),
    "dedup_minhash_incremental": partial(DD.minhash_incremental_pairs,
                                         n=2, threshold=0.2),
    "mm_binary_metadata": MM.binary_metadata,
    "mm_media_features": MM.media_features,
    "mm_frame_sample": MM.frame_sample,
    "mm_audio_windows": MM.audio_windows,
    "grouped_map_sessionize": PO.sessionize_events,
    "udaf_weighted_avg": PO.weighted_avg_by_type,
    "curation_select": partial(CU.curation_select, frac=0.5),
    "dedup_keep_best": partial(CU.dedup_keep_best, n=2, threshold=0.2),
    "pack_sequences": partial(CU.pack_sequences, budget=2048),
    "dedup_embedding_clusters": partial(DD.embedding_clusters, threshold=0.3),
    # r05 scale-safe curation variants (VERDICT r04 item 3); driver
    # windowing is controlled by the explicit WINDOW list below since r06
    "pack_sequences_sharded": partial(CU.pack_sequences_sharded, budget=2048),
    "curation_select_sketch": partial(CU.curation_select_sketch, frac=0.5),
}

ANALYTICS_ORACLE = {
    # pack_sequences_sharded: identical output contract to pack_sequences
    # (columns and values — parity-pinned), so the two-level-prefix-sum
    # plan is hash-checked against the SAME oracle SQL as the exact
    # single-window form. curation_select_sketch: sketch-thresholded —
    # rows-only (selection can differ from the exact quota at the
    # boundary score; containment pytest-pinned in test_curation_scale).
    "pack_sequences_sharded": CU.sql_pack_sequences(budget=2048),
    "dedup_exact": DD.SQL_EXACT_DEDUP,
    "dedup_ngram_jaccard": DD.sql_ngram_jaccard(n=2, threshold=0.2),
    "dedup_embedding_cosine": DD.sql_embedding_neardup(threshold=0.3),
    "dedup_clusters": DD.sql_neardup_clusters(n=2, threshold=0.2),
    "emb_label_centroids": SIM.SQL_LABEL_CENTROIDS,
    "ann_topk_bruteforce": SIM.sql_ann_bruteforce(n_queries=8, k=5),
    "text_token_stats": TS.SQL_TOKEN_STATS,
    "text_quality": TS.SQL_QUALITY_SCORES,
    "text_langid_scores": TS.SQL_LANGID_SCORES,
    "text_langid_predict": TS.SQL_LANGID_PREDICT,
    "text_fingerprint": TS.SQL_FINGERPRINT,
    "grouped_map_sessionize": PO.SQL_SESSIONIZE,
    "udaf_weighted_avg": PO.SQL_WEIGHTED_AVG,
    "curation_select": CU.sql_curation_select(frac=0.5),
    "dedup_keep_best": CU.sql_dedup_keep_best(n=2, threshold=0.2),
    "pack_sequences": CU.sql_pack_sequences(budget=2048),
    "dedup_embedding_clusters": DD.sql_embedding_clusters(threshold=0.3),
    # minhash/simhash/lsh/langid_predict/mm_*: signature-based or
    # model-backed — rows-only (plus pytest property gates on recall)
}


# --- r05 late additions, appended PAST the driver window --------------------
# Three further training-pipeline operators written after the r05 window
# was frozen (the window test pins its exact membership, so adding them
# to ANALYTICS_QUERIES would evict relational entries mid-round). All
# three are DuckDB-oracled and mirror-checked by pytest now; hoist them
# into the window next round exactly like the r04 late additions were
# hoisted this round.
TRAINING_QUERIES = {
    "curation_mixture_sample": CU.curation_mixture_sample,
    # n=4 for the witness: the synthetic fixture corpus shares almost no
    # 8-grams (2 rows); production decontamination runs 8-13 grams and
    # the operator takes n as a parameter
    "curation_contamination": partial(CU.curation_contamination,
                                      n=4, bench_mod=17),
    "pack_manifest": partial(CU.pack_manifest, budget=2048),
    # second r05 batch — Gopher/C4/CCNet-style quality + PII + histogram
    "text_repetition": TS.repetition_scores,
    "text_unigram_logprob": TS.unigram_logprob,
    "text_pii_scrub": TS.pii_scrub,
    "text_length_histogram": partial(TS.length_histogram, bucket=64),
    "curation_quality_filter": CU.quality_filter,
    "curation_score_normalize": CU.score_normalize,
    "text_ngram_topk": partial(TS.ngram_topk, n=2, k=50),
    # graph analytics over the near-dup pair graph: degrees exactly
    # oracled; pagerank is an iterative DataFrame algorithm (float-sum
    # order nondeterminism → rows-only; python-reference parity pytest)
    # incremental cluster maintenance: old-slice labels + batch pairs
    # folded via merge_cluster_labels must equal the from-scratch CC —
    # hash-checked against the SAME recursive-CTE oracle as
    # dedup_clusters
    "dedup_clusters_incremental": partial(DD.clusters_incremental,
                                          n=2, threshold=0.2),
    "graph_degrees": GR.graph_degrees,
    "kg_entity_pagerank": q_kg_entity_pagerank,
    "curation_split": CU.curation_split,
    # 5 iterations for the witness: each power iteration is a sequential
    # join+agg stage pair, pure scheduler overhead on a 47-node fixture
    # graph (the pytest reference-parity gate runs the full 10)
    "graph_pagerank": partial(GR.graph_pagerank, iters=5),
    # new in r06 (VERDICT r05 item 2): the 100 TB graph-analytics edge
    # base — same degree/pagerank math over the MinHash-LSH pair table
    # (banded equi-join, uniform keys) instead of the quadratic-leaning
    # ngram shingle self-join. Signature-based pair set → rows-only;
    # fixture-equality vs the oracled ngram witness pinned in
    # tests/test_graph.py.
    "graph_degrees_lsh": GR.graph_degrees_lsh,
    "graph_pagerank_lsh": partial(GR.graph_pagerank_lsh, iters=5),
    # --- r06 staged pool, registered in the r07 rotation (each one
    # seated in the r07 WINDOW the same round it registers — the
    # staging discipline from VERDICT r05/r06) -------------------------
    # substring-level (fixed-n-gram) exact-duplicate span detection and
    # scrub accounting — the Spark rendition of suffix-array dedup
    # (Lee et al. 2021); see operators/dedup.py "substring-level" section
    "dedup_substring_spans": DD.substring_dup_spans,
    "dedup_substring_scrub": DD.substring_scrub_stats,
    "dedup_substring_scrub_text": DD.substring_scrub_text,
    # Iceberg incremental append scan (CDC-append): manifest-only
    # decision, per-batch cost bounded by new data
    "iceberg_incremental_scan": QQ.q_iceberg_incremental_scan,
    # per-unit bloom filters: point-lookup file skipping where min/max
    # bounds cannot prune (uniformly striped ids)
    "iceberg_bloom_lookup": QQ.q_iceberg_bloom_lookup,
    # privacy-grade curation: suppress rows whose quasi-identifier
    # combination is shared by < k documents
    "curation_k_anonymity": CU.k_anonymity_filter,
    # SCD2 validity intervals from a change stream (table-maintenance
    # form: iceberglite.scd2_upsert)
    "window_scd2": QQ.q_window_scd2,
    # exact-k-per-stratum deterministic draw (salted md5 ranking)
    "sample_exact_k": CU.sample_exact_k,
    # Okapi BM25 term-set retrieval — topical-slice pulls for curation
    "text_bm25_topk": TS.bm25_topk,
}

TRAINING_ORACLE = {
    "curation_mixture_sample": CU.sql_curation_mixture_sample(),
    "curation_contamination": CU.sql_curation_contamination(n=4,
                                                            bench_mod=17),
    "pack_manifest": CU.sql_pack_manifest(budget=2048),
    "text_repetition": TS.SQL_REPETITION_SCORES,
    "text_unigram_logprob": TS.SQL_UNIGRAM_LOGPROB,
    "text_pii_scrub": TS.SQL_PII_SCRUB,
    "text_length_histogram": TS.sql_length_histogram(bucket=64),
    "curation_quality_filter": CU.SQL_QUALITY_FILTER,
    "curation_score_normalize": CU.SQL_SCORE_NORMALIZE,
    "text_ngram_topk": TS.sql_ngram_topk(k=50),
    "curation_split": CU.sql_curation_split(),
    "graph_degrees": GR.sql_graph_degrees(n=2, threshold=0.2),
    "dedup_clusters_incremental": DD.sql_neardup_clusters(n=2,
                                                          threshold=0.2),
    # r06 staged pool oracles, registered with their queries in r07
    "dedup_substring_spans": DD.sql_substring_dup_spans(),
    "dedup_substring_scrub": DD.sql_substring_scrub_stats(),
    "dedup_substring_scrub_text": DD.sql_substring_scrub_text(),
    "iceberg_incremental_scan": QQ.SQL_ICEBERG_INCREMENTAL_SCAN,
    "iceberg_bloom_lookup": QQ.SQL_ICEBERG_BLOOM_LOOKUP,
    "curation_k_anonymity": CU.sql_k_anonymity_filter(),
    "window_scd2": QQ.SQL_WINDOW_SCD2,
    "sample_exact_k": CU.sql_sample_exact_k(),
    "text_bm25_topk": TS.sql_bm25_topk(),
}


# --- staged pool for the NEXT round's rotation ------------------------------
# Queries written after the current round's WINDOW froze. They are NOT
# registered (a registered query needs a WINDOW seat in the round it is
# written — CLAUDE.md invariant; the r03–r05 registered-but-unchecked
# pools were dinged three rounds running). Every entry must be
# DuckDB-oracled and clear the driver's toPandas+hash canon path NOW
# (tests/test_pending.py), so the next rotation is a mechanical two-dict
# move into TRAINING_QUERIES/_ORACLE + the WINDOW, not new verification
# work. The r06 instance of this pool (9 queries) registered in r07.
PENDING_QUERIES: dict = {
    # driver witness for the pytest-only maintenance semantics (VERDICT
    # r06 item 6): scripted append/compact/rollback/WAP lifecycle →
    # snapshots metadata table vs its literal expected history
    "iceberg_metadata_snapshots": QQ.q_iceberg_metadata_snapshots,
    # r07 training-pipeline additions: interpolated bigram LM scoring
    # (the KenLM-direction upgrade of text_unigram_logprob), corpus
    # Zipf-fit diagnostic (also covers the regr_* aggregate family),
    # edit-distance verification of shingle near-dup candidates, and
    # the C4/Gopher-style per-domain document cap
    "text_bigram_logprob": TS.bigram_logprob,
    "text_zipf_slope": TS.zipf_slope,
    "dedup_edit_verify": DD.edit_verify_pairs,
    "curation_domain_cap": CU.domain_cap,
    # composite TPC-H-style witnesses: classic multi-join + grouped
    # decimal-money aggregates + deterministic top-k, end-to-end plans
    # the optimizer must get right as a whole (pushdown below the join,
    # broadcast dim chain, partial agg above)
    "tpch_q1": QQ.q_tpch_q1,
    "tpch_q3": QQ.q_tpch_q3,
    "tpch_q5": QQ.q_tpch_q5,
    # ordered conversion funnel over the event stream (single shuffle:
    # chained conditional per-user aggregates)
    "funnel_steps": QQ.q_funnel_steps,
    # per-node triangle counts of the near-dup graph (oriented-edge
    # wedge join — clique-vs-chain cohesion diagnostic)
    "graph_triangles": GR.graph_triangles,
    # ordered string aggregation (LISTAGG family) and robust per-group
    # stats (exact median + MAD)
    "agg_string_concat": QQ.q_agg_string_concat,
    "agg_median_mad": QQ.q_agg_median_mad,
    # Spark 4 VARIANT semi-structured access (parse once, typed paths)
    "json_variant": QQ.q_json_variant,
    # WARC-lite Python Data Source round-trip (SRC5 driver witness)
    "src_warclite_roundtrip": QQ.q_src_warclite_roundtrip,
    # per-doc tf-idf keyword extraction (the labeling complement of BM25)
    "text_tfidf_topk": TS.tfidf_topk,
    # grouping_id/grouping markers over CUBE (subtotal disambiguation)
    "agg_grouping_id": QQ.q_agg_grouping_id,
    # edit verify / triangles over the MinHash-LSH candidate table —
    # the 100 TB candidate base (rows-only by nature: signature-based
    # pair set; fixture-equality vs the oracled ngram forms pinned)
    "dedup_edit_verify_lsh": partial(DD.edit_verify_pairs_lsh,
                                     n=2, threshold=0.2),
    "graph_triangles_lsh": GR.graph_triangles_lsh,
}

#: pending entries that are rows-only BY NATURE (signature/model/
#: sampler-based — no SQL oracle can exist): they still clear the
#: driver's canon path in tests/test_pending.py, and their correctness
#: is pinned by dedicated pytest parity gates instead of DuckDB.
PENDING_ROWS_ONLY = {"dedup_edit_verify_lsh", "graph_triangles_lsh"}

PENDING_ORACLE: dict[str, str] = {
    "iceberg_metadata_snapshots": QQ.SQL_ICEBERG_METADATA_SNAPSHOTS,
    "text_bigram_logprob": TS.sql_bigram_logprob(),
    "text_zipf_slope": TS.sql_zipf_slope(),
    "dedup_edit_verify": DD.sql_edit_verify_pairs(),
    "curation_domain_cap": CU.sql_domain_cap(),
    "tpch_q1": QQ.SQL_TPCH_Q1,
    "tpch_q3": QQ.SQL_TPCH_Q3,
    "tpch_q5": QQ.SQL_TPCH_Q5,
    "funnel_steps": QQ.SQL_FUNNEL_STEPS,
    "graph_triangles": GR.sql_graph_triangles(),
    "agg_string_concat": QQ.SQL_AGG_STRING_CONCAT,
    "agg_median_mad": QQ.SQL_AGG_MEDIAN_MAD,
    "json_variant": QQ.SQL_JSON_VARIANT,
    "src_warclite_roundtrip": QQ.SQL_SRC_WARCLITE_ROUNDTRIP,
    "text_tfidf_topk": TS.sql_tfidf_topk(),
    "agg_grouping_id": QQ.SQL_AGG_GROUPING_ID,
}


# The driver hash-checks only the first ~50 all_queries() entries in dict
# order (every CORRECTNESS file so far cut at exactly 50). Through r05 the
# window was implied by section ordering, which made every rotation a
# fragile dict-reordering dance and let three rounds accumulate
# appended-past-the-window pools. From r06 the window is an EXPLICIT name
# list: all_queries() emits WINDOW names first (in list order), then every
# other registered query — rotation is editing one list, and two tests pin
# it (exact membership + a stamp-age rule: every oracled query must hold a
# driver row from the last 3 rounds or sit in the current window;
# tests/test_registry.py).
DRIVER_WINDOW = 50

# r07 rotation accounting (computed by propose_next_window from the
# committed CORRECTNESS files — VERDICT r06 item 2): 9 mandatory seats
# for the r06 staged pool registering this round (first driver rows), 18
# mandatory stamp-age seats (12 queries last checked r03 + 6 last checked
# r04 — their stamps expire when CORRECTNESS_r07 lands), and 23 fillers
# oldest-stamp-first (the r04-stamped percentile/asof/filter/higher-order
# slots and the r05-stamped dedup/ANN/curation analytics block).
# 9 + 18 + 23 = 50 exactly. Rotated OUT (all r05/r06-green, stamp age
# ≤ 2): kg_triple_metrics + the r06 training-pipeline block, the r06
# relational re-stamps, and the kg_* chain queries.
WINDOW = [
    # r06 staged pool — registering this round, first driver rows
    "dedup_substring_spans", "dedup_substring_scrub",
    "dedup_substring_scrub_text",
    "iceberg_incremental_scan", "iceberg_bloom_lookup",
    "curation_k_anonymity", "window_scd2", "sample_exact_k",
    "text_bm25_topk",
    # stamp-age refresh: last driver-checked in r03
    "agg_count_distinct", "agg_cube", "agg_group_multi", "agg_rollup",
    "join_full", "join_left", "join_semi", "sort_limit",
    "window_frame_sum", "window_lag_lead", "window_rank",
    "window_topk_per_group",
    # stamp-age refresh: last driver-checked in r04
    "join_anti", "join_broadcast", "join_shuffledhash", "join_sortmerge",
    "join_theta", "stream_sliding_batch",
    # fillers, oldest-stamp-first (r04 stamps...)
    "agg_approx_percentile", "agg_exact_percentile", "filter_pushdown",
    "higher_order_funcs", "join_asof",
    # (...then r05 stamps: the dedup/similarity/curation analytics block)
    "ann_topk_bruteforce", "ann_topk_ivf", "ann_topk_lsh",
    "curation_select", "curation_select_sketch",
    "dedup_clusters", "dedup_embedding_clusters", "dedup_embedding_cosine",
    "dedup_exact", "dedup_keep_best", "dedup_minhash_incremental",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_winnow_pairs", "emb_label_centroids", "grouped_map_sessionize",
    "iceberg_stats_skipping",
]


def all_queries() -> dict:
    base: dict = {}
    base.update(ANALYTICS_QUERIES)
    base.update(KG_QUERIES)
    base.update(RELATIONAL_QUERIES)
    base.update(TRAINING_QUERIES)
    missing = [n for n in WINDOW if n not in base]
    # explicit raises, not assert: these guard the driver's hash-checked
    # prefix and must survive `python -O` (ADVICE r06 low)
    if missing:
        raise ValueError(f"WINDOW names not registered: {missing}")
    if len(WINDOW) != DRIVER_WINDOW:
        raise ValueError(
            f"WINDOW has {len(WINDOW)} seats, expected {DRIVER_WINDOW}")
    out = {name: base[name] for name in WINDOW}
    out.update((k, v) for k, v in base.items() if k not in out)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(RELATIONAL_ORACLE)
    out.update(ANALYTICS_ORACLE)
    out.update(TRAINING_ORACLE)
    out.update(KG_ORACLE)
    return out


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """The headline query: the full KG construction chain — extraction →
    joint NER+RE inference → entity linking → connected-components
    canonicalization → deduplicated (subj, pred, obj) triples."""
    return q_kg_canonical_triples(spark, sf_dir).orderBy(
        F.desc("evidence_count"), "subj", "pred", "obj")


def propose_next_window(repo_root: str | None = None) -> dict:
    """Mechanize the next round's rotation (VERDICT r05 item 4 carried
    one step further): from the committed CORRECTNESS files plus this
    round's WINDOW (which becomes the next CORRECTNESS file), compute
    who MUST sit in the next window — the staged PENDING pool (a
    query registers only with a same-round seat) and every query whose
    newest driver stamp will fall out of the 3-round freshness rule —
    then fill the remaining seats oldest-stamp-first. Returns the seat
    accounting; the deliberate rotation copies `proposal` into WINDOW
    and tests/test_registry.py. Raises if the mandatory set alone
    overflows DRIVER_WINDOW (that means the pending pool must shrink or
    the window rule must be revisited — loudly, not silently)."""
    import glob
    import re

    root = repo_root or _REPO_ROOT
    rounds: dict[int, set] = {}
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r0*(\d+)\.json$", f).group(1))
        with open(f) as fh:
            rounds[rnd] = set(json.load(fh))
    # The current WINDOW becomes a stamp file — but only synthesize that
    # future round if the driver has NOT already committed it. Once
    # CORRECTNESS_r{max}.json == set(WINDOW) is on disk (the normal state
    # at the start of a round), stamping it again would double-advance
    # the clock and balloon the expiring set (ADVICE r06 high: planned
    # round 8 instead of 7, 77 mandatory seats, planner unusable exactly
    # when the rotation needed it).
    if rounds[max(rounds)] == set(WINDOW):
        this_round = max(rounds)
    else:
        this_round = max(rounds) + 1
        rounds[this_round] = set(WINDOW)
    next_round = this_round + 1
    last: dict[str, int] = {}
    for rnd, names in rounds.items():
        for n in names:
            last[n] = max(last.get(n, 0), rnd)
    registered = set(all_queries())
    pending = list(PENDING_QUERIES)
    expiring = sorted(q for q in registered
                      if last.get(q, 0) <= next_round - 3)
    mandatory = pending + expiring
    if len(mandatory) > DRIVER_WINDOW:
        raise ValueError(
            f"mandatory seats ({len(mandatory)}) overflow the "
            f"{DRIVER_WINDOW}-entry window: {mandatory}")
    filler = sorted((q for q in registered if q not in set(mandatory)),
                    key=lambda q: (last.get(q, 0), q))
    proposal = mandatory + filler[:DRIVER_WINDOW - len(mandatory)]
    return {"round": next_round, "pending": pending,
            "expiring": expiring, "filler_used":
                filler[:DRIVER_WINDOW - len(mandatory)],
            "proposal": proposal}
