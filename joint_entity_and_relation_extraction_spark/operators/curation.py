"""Corpus-curation operators for training-data mixtures (task brief:
"the operations a large-scale training-data pipeline would need"):
per-source quality-ranked selection and keep-best-per-duplicate-cluster.
Both are pure built-ins (whole-stage codegen) and fully SQL-expressible,
so the driver hash-checks them end-to-end.

Scale notes: `curation_select` shuffles once on `source` and windows
inside each source partition — exact semantics, oracle-checkable. At
extreme scale (a source with 10^10 docs) the same selection is done with
a mergeable per-source quantile sketch as the score threshold
(`agg_approx_percentile` demonstrates that aggregation shape); the
window form here is the exact reference semantics the sketch variant
approximates. `dedup_keep_best` joins cluster labels (small: only docs
that appear in a near-dup pair) against per-doc scores and reduces with
a map-side-combinable max_by aggregation — no window sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import read_table
from .dedup import neardup_clusters, sql_neardup_clusters

# the curation score: distinct-token ratio, rounded to 6 places on both
# engines (the repo-wide cross-engine rounding rule, plans/queries.py)
_SCORE = "ROUND(CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)" \
         " / LEN(STRING_SPLIT(text, ' ')), 6)"


def _score_col():
    words = F.split(F.col("text"), " ")
    return F.round(
        F.size(F.array_distinct(words)).cast("double")
        / F.size(words).cast("double"), 6)


def curation_select(spark: SparkSession, sf_dir: str,
                    frac: float = 0.5) -> DataFrame:
    """Per-source quality-ranked selection: keep the top ``frac`` of each
    source's documents by distinct-token ratio (ties broken by doc_id) —
    the downsample-overrepresented-strata primitive of mixture curation,
    with an exact per-source quota (ceil(n_src * frac)) rather than a
    Bernoulli rate, so the output is deterministic and oracle-equal."""
    d = read_table(spark, sf_dir, "documents")
    base = d.select("doc_id", "source", _score_col().alias("q_score"))
    w = Window.partitionBy("source").orderBy(F.desc("q_score"),
                                             F.asc("doc_id"))
    wc = Window.partitionBy("source")
    return (base
            .withColumn("src_rank", F.row_number().over(w).cast("bigint"))
            .withColumn("n_src", F.count("*").over(wc))
            .filter(F.col("src_rank")
                    <= F.ceil(F.col("n_src") * F.lit(frac)))
            .select("doc_id", "source", "q_score", "src_rank"))


def sql_curation_select(frac: float = 0.5) -> str:
    return f"""
WITH scored AS (
  SELECT doc_id, source, {_SCORE} AS q_score,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY {_SCORE} DESC, doc_id) AS BIGINT)
           AS src_rank,
         COUNT(*) OVER (PARTITION BY source) AS n_src
  FROM documents
)
SELECT doc_id, source, q_score, src_rank
FROM scored WHERE src_rank <= CEIL(n_src * {frac})
"""


def pack_sequences(spark: SparkSession, sf_dir: str,
                   budget: int = 2048) -> DataFrame:
    """Concat-and-chunk sequence packing — the standard LLM-pretraining
    batching move: documents are laid out in a deterministic order
    (doc_id) within each language shard, and a document belongs to the
    pack its START offset falls in (floor(start / budget)), exactly how
    a tokenized stream is split into fixed-length training windows.
    Output: (doc_id, lang, n_tokens, start_offset, pack_id).

    Scale shape: one shuffle on the shard key + a running-sum window
    inside each shard. At 100 TB the shard key is (lang, file-partition)
    so no single window partition holds the corpus; the per-shard
    prefix-sum is the only sequential dependency, which is the same
    trade every packing implementation makes."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " ")).cast("bigint")
    base = d.select("doc_id", "lang", toks.alias("n_tokens"))
    w = (Window.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (base
            .withColumn("start_offset", start.cast("bigint"))
            .withColumn("pack_id",
                        F.floor(F.col("start_offset")
                                / F.lit(float(budget))).cast("bigint")))


def sql_pack_sequences(budget: int = 2048) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
offs AS (
  SELECT doc_id, lang, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING)
              - n_tokens AS BIGINT) AS start_offset
  FROM t
)
SELECT doc_id, lang, n_tokens, start_offset,
       CAST(FLOOR(start_offset / {float(budget)}) AS BIGINT) AS pack_id
FROM offs
"""


def pack_sequences_sharded(spark: SparkSession, sf_dir: str,
                           budget: int = 2048,
                           n_shards: int = 8) -> DataFrame:
    """Scale-safe :func:`pack_sequences` (VERDICT r04 item 3): identical
    output, but no window partition ever holds a whole language.

    The exact form windows over ``partitionBy(lang)`` — at 100x scale one
    language IS the corpus and that window is a single-task sort. Here
    the prefix sum is two-level over a compound (lang, shard) key:

    1. shard = floor(doc_id / W), an ORDER-PRESERVING range bucket
       (doc_id ascending implies (shard, doc_id) ascending), so the
       document order — and therefore every offset — is identical to the
       exact form. In production the shard is the monotonic ingest-file
       id; here W is derived from max(doc_id), one scalar aggregate.
    2. a per-(lang, shard) running sum (bounded partitions), plus a
       per-shard total rollup whose cumulative sum over shards (a window
       over n_shards rows per language — driver-scale) is broadcast back
       as each shard's base offset.

    start_offset = shard_base + within-shard prefix, which telescopes to
    exactly the single-window prefix sum — equality with
    :func:`pack_sequences` is pytest-pinned, and the same SQL oracle
    hash-checks both."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " ")).cast("bigint")
    base = d.select("doc_id", "lang", toks.alias("n_tokens"))
    max_id = base.agg(F.max("doc_id")).first()[0] or 0
    width = max(1, (int(max_id) + n_shards) // n_shards)
    base = base.withColumn("shard", (F.col("doc_id") / width)
                           .cast("bigint"))
    w_in = (Window.partitionBy("lang", "shard").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = F.sum("n_tokens").over(w_in) - F.col("n_tokens")
    # per-shard totals: n_shards rows per language — the rollup and its
    # cumulative window are driver-scale no matter the corpus size
    totals = base.groupBy("lang", "shard").agg(
        F.sum("n_tokens").alias("shard_tokens"))
    w_sh = (Window.partitionBy("lang").orderBy("shard")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    bases = totals.withColumn(
        "shard_base",
        (F.sum("shard_tokens").over(w_sh)
         - F.col("shard_tokens")).cast("bigint")).drop("shard_tokens")
    return (base
            .withColumn("local_prefix", local.cast("bigint"))
            .join(F.broadcast(bases), ["lang", "shard"])
            .withColumn("start_offset",
                        (F.col("shard_base") + F.col("local_prefix"))
                        .cast("bigint"))
            .withColumn("pack_id",
                        F.floor(F.col("start_offset")
                                / F.lit(float(budget))).cast("bigint"))
            .select("doc_id", "lang", "n_tokens", "start_offset",
                    "pack_id"))


def curation_select_sketch(spark: SparkSession, sf_dir: str,
                           frac: float = 0.5) -> DataFrame:
    """Scale-safe :func:`curation_select` (VERDICT r04 item 3): the
    per-source quota comes from a mergeable quantile SKETCH threshold
    instead of a full per-source ranking window.

    The exact form row_number()s every document of a source inside one
    window partition — a single-task sort once a source has 10^10 docs.
    Here each source's score threshold is approx_percentile(q_score,
    1 - frac) — a map-side-combinable sketch aggregation — broadcast
    back as a threshold filter. Selection can differ from the exact form
    only AT the quota-boundary score (sketch rank error + ties at the
    threshold); the containment bounds are pytest-pinned against
    :func:`curation_select` (tests/test_curation). Output marks each
    kept doc with its source threshold rather than a rank (ranking is
    exactly what the scale path avoids)."""
    d = read_table(spark, sf_dir, "documents")
    base = d.select("doc_id", "source", _score_col().alias("q_score"))
    thr = base.groupBy("source").agg(
        F.percentile_approx("q_score", 1.0 - frac, 10000).alias("thr"))
    return (base.join(F.broadcast(thr), "source")
            .filter(F.col("q_score") >= F.col("thr"))
            .select("doc_id", "source", "q_score",
                    F.round("thr", 6).alias("src_threshold")))


def dedup_keep_best(spark: SparkSession, sf_dir: str, n: int = 2,
                    threshold: float = 0.2) -> DataFrame:
    """Keep-one-per-near-dup-cluster, quality-aware: for every cluster
    from :func:`~.dedup.neardup_clusters`, retain the highest-scoring
    document (tie → lowest doc_id). The reduction is a max_by over a
    (score, -doc_id) struct — a map-side-combinable aggregation, not a
    window sort (same rule as linking's top-1, linking.py)."""
    clusters = neardup_clusters(spark, sf_dir, n=n, threshold=threshold)
    d = read_table(spark, sf_dir, "documents")
    scores = d.select("doc_id", _score_col().alias("q_score"))
    joined = clusters.join(scores, "doc_id")
    key = F.struct(F.col("q_score"), (-F.col("doc_id")).alias("nd"))
    return (joined.groupBy("cluster_id")
            .agg(F.max_by("doc_id", key).alias("keep_doc_id"),
                 F.max("q_score").alias("best_score"),
                 F.count("*").alias("n_docs")))


def sql_dedup_keep_best(n: int = 2, threshold: float = 0.2) -> str:
    clusters = sql_neardup_clusters(n=n, threshold=threshold)
    return f"""
WITH clusters AS ({clusters}),
scored AS (
  SELECT c.cluster_id, c.doc_id, {_SCORE} AS q_score,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                            ORDER BY {_SCORE} DESC, c.doc_id) AS rn
  FROM clusters c JOIN documents USING (doc_id)
)
SELECT cluster_id,
       MAX(CASE WHEN rn = 1 THEN doc_id END) AS keep_doc_id,
       MAX(q_score) AS best_score,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM scored GROUP BY cluster_id
"""
