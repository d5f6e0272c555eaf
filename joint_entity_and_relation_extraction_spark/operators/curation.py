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


#: Multiplicative-hash constants for the per-doc uniform deviate both
#: engines compute EXACTLY in 64-bit integer arithmetic (engine RNGs
#: never agree; seeded hashing is how production pipelines make sampling
#: reproducible anyway). The id is split into 32-bit halves, each
#: multiplied by a SMALL (16-bit) constant, then the 32-bit state is put
#: through two more multiply-mod rounds: every intermediate stays below
#: 2^48 — no int64 overflow for ANY 63-bit doc_id (Spark 4 runs ANSI
#: mode, where a wrapped multiply is a runtime error, and a wrap would
#: diverge from DuckDB's HUGEINT arithmetic anyway) — while the extra
#: rounds restore uniformity for small dense ids (one round of x*40503
#: never wraps for x < 2^17, leaving u proportional to x; measured: mean
#: 0.499, P(u<0.25)=0.252 on ids 0..499 AND on the top of the 63-bit
#: range).
_K_LO = 40503
_K_HI = 12739
#: split-stream multiplier — spectrally screened (see curation_split)
_K_SPLIT = 32537
_U32 = 4294967296

#: default per-source mixture rates for the registered witness: a
#: high-quality source kept whole, the rest downsampled — the
#: reweight-the-mixture primitive of pretraining-data curation
MIXTURE_RATES = {"src0": 1.0, "src1": 0.75, "src2": 0.5}
MIXTURE_DEFAULT_RATE = 0.25


def curation_mixture_sample(spark: SparkSession, sf_dir: str,
                            rates: dict[str, float] | None = None,
                            default_rate: float = MIXTURE_DEFAULT_RATE
                            ) -> DataFrame:
    """Deterministic mixture sampling: keep each document with its
    source's target rate, decided by a per-doc uniform deviate: a
    3-round multiply-mod hash of the id's 32-bit halves over 2^32 (see
    the _K_LO note) — pure overflow-free integer arithmetic, so the same
    doc is
    kept at the same rate on ANY engine/cluster/run (the reproducibility
    contract `sample()`'s engine RNG cannot give), and raising a
    source's rate strictly grows its sample (nested samples: u <= 0.25
    implies u <= 0.5). One narrow scan, no shuffle, no RNG state — at
    10^12 docs this is a pushed-down filter."""
    rates = MIXTURE_RATES if rates is None else rates
    d = read_table(spark, sf_dir, "documents")
    # `div` is integer division (floor(a/b) would round-trip through a
    # DOUBLE and lose exactness above 2^53 — measured divergence at
    # doc_id = 2^63-1)
    mixed = (F.pmod(F.col("doc_id"), F.lit(_U32)) * F.lit(_K_LO)
             + F.expr(f"doc_id div {_U32}") * F.lit(_K_HI))
    state = F.pmod(mixed, F.lit(_U32))
    for _ in range(2):  # extra multiply-mod rounds (see constant note)
        state = F.pmod(state * F.lit(_K_LO), F.lit(_U32))
    u = state / F.lit(float(_U32))
    rate = F.coalesce(
        *[F.when(F.col("source") == s, F.lit(float(r)))
          for s, r in sorted(rates.items())],
        F.lit(float(default_rate)))
    # filter on the RAW deviate (the SQL oracle's WHERE is unrounded);
    # rounding u first dropped docs whose u lies within 5e-7 below a
    # rate boundary that DuckDB kept — ADVICE r05. round(u, 6) is
    # output-only, same as curation_split.
    return (d.filter(u < rate)
            .select("doc_id", "source", F.round(u, 6).alias("u"),
                    rate.alias("rate")))


def sql_curation_mixture_sample(rates: dict[str, float] | None = None,
                                default_rate: float = MIXTURE_DEFAULT_RATE
                                ) -> str:
    rates = MIXTURE_RATES if rates is None else rates
    case = " ".join(f"WHEN source = '{s}' THEN {float(r)}"
                    for s, r in sorted(rates.items()))
    # same 3-round overflow-free arithmetic as the Spark side (DuckDB //
    # is floor division, % is sign-of-dividend; doc_ids are non-negative
    # so both match Spark's pmod/div exactly)
    a = f"(((doc_id % {_U32}) * {_K_LO} + (doc_id // {_U32}) * {_K_HI}) % {_U32})"
    c = f"((({a} * {_K_LO}) % {_U32}) * {_K_LO}) % {_U32}"
    u = f"({c}) / {float(_U32)}"
    return f"""
SELECT doc_id, source,
       ROUND({u}, 6) AS u,
       CASE {case} ELSE {float(default_rate)} END AS rate
FROM documents
WHERE {u} < CASE {case} ELSE {float(default_rate)} END
"""


def curation_contamination(spark: SparkSession, sf_dir: str,
                           n: int = 8, bench_mod: int = 17) -> DataFrame:
    """Benchmark decontamination — the check every pretraining pipeline
    runs before training: flag corpus documents sharing at least one
    word n-gram with a held-out benchmark set. The witness benchmark is
    the doc_id % ``bench_mod`` == 0 slice of ``documents``; production
    swaps in the real eval suites (a table many orders of magnitude
    smaller than the corpus, so the join's build side stays broadcast-
    or bucket-sized). Shape: explode distinct n-grams per side, hash
    equi-join on the n-gram, per-doc count rollup — corpus side touched
    once, no windows. Output: (doc_id, n_shared_ngrams BIGINT,
    n_benchmark_docs BIGINT) for contaminated docs only."""
    d = read_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    # guard: sequence(1, stop) with stop < 1 would generate DESCENDING
    # indices, not an empty list — a doc shorter than n words has no
    # n-grams
    idx = F.when(F.size(words) >= n,
                 F.sequence(F.lit(1), F.size(words) - (n - 1))
                 ).otherwise(F.array().cast("array<int>"))
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n))))
    corpus = (d.filter((F.col("doc_id") % bench_mod) != 0)
              .select("doc_id", F.explode(grams).alias("g")))
    bench = (d.filter((F.col("doc_id") % bench_mod) == 0)
             .select(F.col("doc_id").alias("bench_id"),
                     F.explode(grams).alias("g"))
             .dropDuplicates(["bench_id", "g"]))
    return (corpus.join(bench, "g")
            .groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n_shared_ngrams"),
                 F.countDistinct("bench_id").cast("bigint")
                 .alias("n_benchmark_docs")))


def sql_curation_contamination(n: int = 8, bench_mod: int = 17) -> str:
    # generate_series(1, negative) as a SCALAR list function returns []
    # (verified), so short docs contribute no grams — matching the Spark
    # side's explicit when() guard
    return f"""
WITH docs AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS words FROM documents
),
grams AS (
  SELECT doc_id,
         UNNEST(LIST_DISTINCT([ARRAY_TO_STRING(words[i:i+{n - 1}], ' ')
                               FOR i IN GENERATE_SERIES(1, LEN(words) - {n - 1})]))
           AS g
  FROM docs
),
corpus AS (SELECT * FROM grams WHERE doc_id % {bench_mod} != 0),
bench AS (SELECT doc_id AS bench_id, g FROM grams
          WHERE doc_id % {bench_mod} = 0)
SELECT c.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams,
       CAST(COUNT(DISTINCT b.bench_id) AS BIGINT) AS n_benchmark_docs
FROM corpus c JOIN bench b USING (g)
GROUP BY c.doc_id
"""


def pack_manifest(spark: SparkSession, sf_dir: str,
                  budget: int = 2048) -> DataFrame:
    """Per-pack rollup of :func:`pack_sequences_sharded` — the manifest a
    training loader actually consumes: one row per (lang, pack) with its
    document count, token mass and first document. Map-side-combinable
    aggregation over the packing output; no additional windows."""
    packs = pack_sequences_sharded(spark, sf_dir, budget=budget)
    return (packs.groupBy("lang", "pack_id")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
                 F.min("doc_id").alias("first_doc_id")))


def sql_pack_manifest(budget: int = 2048) -> str:
    return f"""
WITH packs AS ({sql_pack_sequences(budget=budget)})
SELECT lang, pack_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc_id
FROM packs GROUP BY lang, pack_id
"""


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


def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style rule-based pre-filter (Raffel et al. 2020 §2.2 adapted to
    the single-line synthetic corpus): per-document boolean reasons plus
    the final keep decision, so a pipeline can both filter AND report
    per-rule drop rates. Pure whole-stage-codegen built-ins — at 100 TB
    this is a map-only pass that Catalyst folds into the scan."""
    d = read_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n = F.size(words).cast("double")
    avg_len = (F.expr("aggregate(split(text, ' '), 0L, "
                      "(a, x) -> a + length(x))").cast("double") / n)
    distinct_ratio = F.size(F.array_distinct(words)).cast("double") / n
    return (d.select(
        "doc_id",
        (n < 10).alias("too_short"),
        (distinct_ratio < 0.3).alias("low_diversity"),
        ((avg_len < 2.0) | (avg_len > 12.0)).alias("bad_word_len"))
        .withColumn("keep", ~F.col("too_short") & ~F.col("low_diversity")
                    & ~F.col("bad_word_len")))


SQL_QUALITY_FILTER = """
WITH f AS (
  SELECT doc_id,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) AS n,
         CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE) AS nd,
         CAST(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(text, ' '),
                                      x -> LENGTH(x))) AS DOUBLE) AS chars
  FROM documents)
SELECT doc_id,
       n < 10 AS too_short,
       nd / n < 0.3 AS low_diversity,
       (chars / n < 2.0 OR chars / n > 12.0) AS bad_word_len,
       NOT (n < 10) AND NOT (nd / n < 0.3)
           AND NOT (chars / n < 2.0 OR chars / n > 12.0) AS keep
FROM f
"""


def score_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language score standardization — mixture balancing needs
    scores comparable ACROSS strata before global thresholds apply:
    z-score and min-max of the curation quality score within each lang.
    Grouped moments via one map-side-combinable aggregation broadcast
    back onto the rows (two narrow passes, no window sort over a
    stratum — the scale trap curation_select_sketch documents)."""
    d = read_table(spark, sf_dir, "documents")
    scored = d.select("doc_id", "lang", _score_col().alias("q_score"))
    stats = scored.groupBy("lang").agg(
        F.avg("q_score").alias("mu"),
        F.stddev_pop("q_score").alias("sigma"),
        F.min("q_score").alias("lo"),
        F.max("q_score").alias("hi"))
    j = scored.join(F.broadcast(stats), "lang")
    return j.select(
        "doc_id", "lang",
        F.round(F.when(F.col("sigma") > 0,
                       (F.col("q_score") - F.col("mu")) / F.col("sigma"))
                .otherwise(0.0), 6).alias("z_score"),
        F.round(F.when(F.col("hi") > F.col("lo"),
                       (F.col("q_score") - F.col("lo"))
                       / (F.col("hi") - F.col("lo")))
                .otherwise(0.0), 6).alias("minmax_score"))


SQL_SCORE_NORMALIZE = f"""
WITH scored AS (
  SELECT doc_id, lang, {_SCORE} AS q_score FROM documents),
stats AS (
  SELECT lang, AVG(q_score) AS mu, STDDEV_POP(q_score) AS sigma,
         MIN(q_score) AS lo, MAX(q_score) AS hi
  FROM scored GROUP BY lang)
SELECT doc_id, scored.lang,
       ROUND(CASE WHEN sigma > 0 THEN (q_score - mu) / sigma
                  ELSE 0.0 END, 6) AS z_score,
       ROUND(CASE WHEN hi > lo THEN (q_score - lo) / (hi - lo)
                  ELSE 0.0 END, 6) AS minmax_score
FROM scored JOIN stats ON scored.lang = stats.lang
"""


def curation_split(spark: SparkSession, sf_dir: str,
                   train: float = 0.8, val: float = 0.1) -> DataFrame:
    """Deterministic train/val/test assignment: the same 3-round
    multiply-mod uniform as :func:`curation_mixture_sample` but with its
    own multiplier _K_SPLIT, so the split deviate is an independent
    stream from the sampling deviate (a doc's mixture keep/drop and its
    split assignment don't correlate — pytest-pinned). The multiplier is
    spectrally screened: K^3/2^32 mod 1 must sit far from every
    low-denominator rational, or dense sequential ids fall on a short
    orbit (the first pick, _K_HI, has K^3/2^32 within 2e-4 of 1/3 —
    every small id landed on {0, 1/3, 2/3} and 100% of the fixture
    split "train"). All intermediates stay below 2^48: overflow-free
    exact integers on any engine. Every engine/cluster/run assigns
    the same doc to the same split; thresholding one deviate makes the
    splits exhaustive and disjoint by construction, and growing `train`
    only ever MOVES docs val→train (never reshuffles). One narrow scan,
    no shuffle, no RNG state."""
    d = read_table(spark, sf_dir, "documents")
    mixed = (F.pmod(F.col("doc_id"), F.lit(_U32)) * F.lit(_K_SPLIT)
             + F.expr(f"doc_id div {_U32}") * F.lit(_K_HI))
    state = F.pmod(mixed, F.lit(_U32))
    for _ in range(2):
        state = F.pmod(state * F.lit(_K_SPLIT), F.lit(_U32))
    u = state / F.lit(float(_U32))
    split = (F.when(u < train, "train")
             .when(u < train + val, "val").otherwise("test"))
    return d.select("doc_id", "lang", F.round(u, 6).alias("u"),
                    split.alias("split"))


def sql_curation_split(train: float = 0.8, val: float = 0.1) -> str:
    a = (f"(((doc_id % {_U32}) * {_K_SPLIT} + (doc_id // {_U32}) * {_K_HI})"
         f" % {_U32})")
    c = f"((({a} * {_K_SPLIT}) % {_U32}) * {_K_SPLIT}) % {_U32}"
    u = f"(({c}) / {float(_U32)})"
    return f"""
SELECT doc_id, lang, ROUND({u}, 6) AS u,
       CASE WHEN {u} < {float(train)} THEN 'train'
            WHEN {u} < {float(train + val)} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def k_anonymity_filter(spark: SparkSession, sf_dir: str,
                       quasi: tuple = ("lang", "source"),
                       k: int = 5) -> DataFrame:
    """Privacy-grade curation (r06, registered in the r07 rotation): suppress every
    document whose quasi-identifier combination is shared by fewer than
    k documents — the standard k-anonymity release rule, the structured
    complement of the regex PII scrub (textstats.pii_scrub removes
    identifiers IN the text; this removes rows whose METADATA is
    identifying). Survivors carry their group size so downstream
    sampling can reweight.

    Scale shape: one map-side-combinable groupBy on the quasi columns,
    then a join back keyed the same way — the group-count table is
    |distinct combinations|, usually broadcastable, but that is left to
    cost-based selection (no hint), exactly like the substring dedup
    semi-join."""
    d = read_table(spark, sf_dir, "documents")
    counts = (d.groupBy(*quasi)
              .agg(F.count("*").alias("grp_n"))
              .filter(F.col("grp_n") >= k))
    return (d.join(counts, list(quasi))
            .select("doc_id", *quasi, "grp_n"))


def sql_k_anonymity_filter(quasi: tuple = ("lang", "source"),
                           k: int = 5) -> str:
    q = ", ".join(quasi)
    return f"""
WITH grp AS (
  SELECT {q}, CAST(COUNT(*) AS BIGINT) AS grp_n
  FROM documents GROUP BY {q} HAVING COUNT(*) >= {k}
)
SELECT d.doc_id, {', '.join('d.' + c for c in quasi)}, grp.grp_n
FROM documents d JOIN grp USING ({q})
"""


def sample_exact_k(spark: SparkSession, sf_dir: str,
                   strata: tuple = ("lang",), k: int = 10,
                   salt: str = "17") -> DataFrame:
    """Deterministic exact-k-per-stratum sampling (r06, staged
    registered in the r07 rotation): rank documents inside each stratum by the md5 of their
    id + salt and keep the first k — a reproducible "random" draw with an
    EXACT size guarantee per stratum, which fraction-based
    sample_stratified cannot give (its per-stratum counts are binomial).
    Changing the salt redraws the sample; the same salt replays it
    bit-identically on any engine, so the oracle is the literal same
    ranking in SQL.

    Scale shape: one rank window per stratum — the standard top-k-per-
    group plan (single exchange on the strata columns); k rows per
    stratum leave the shuffle."""
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents")
    key = F.md5(F.concat_ws("-", F.col("doc_id").cast("string"),
                            F.lit(salt)))
    w = Window.partitionBy(*strata).orderBy(key.asc(), F.col("doc_id"))
    return (d.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("doc_id", *strata, F.col("rk").cast("long").alias("rk")))


def sql_sample_exact_k(strata: tuple = ("lang",), k: int = 10,
                       salt: str = "17") -> str:
    q = ", ".join(strata)
    return f"""
SELECT doc_id, {q}, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT doc_id, {q},
         ROW_NUMBER() OVER (
           PARTITION BY {q}
           ORDER BY MD5(CAST(doc_id AS VARCHAR) || '-' || '{salt}'), doc_id
         ) AS rk
  FROM documents
)
WHERE rk <= {k}
"""


def domain_cap(spark: SparkSession, sf_dir: str, cap: int = 5) -> DataFrame:
    """Per-domain document cap (r07, staged for r08) — the crawl-curation
    rule that stops any single site from dominating the corpus (C4 and
    Gopher both cap per-domain contributions): extract the registered
    domain from each document's URL, rank the domain's documents by
    quality (length here; any score column slots in), keep the best
    ``cap``. The synthetic corpus carries no URL column, so the witness
    first splices a deterministic URL per document (same expression on
    both engines — the pii_scrub precedent); the operator under test is
    the host-extraction + per-domain top-k.

    Scale shape: URL parsing is a map-only regexp; the cap is the
    standard top-k-per-group single-exchange window on the domain key.
    Domains are heavy-tailed — at crawl scale the hot-domain partitions
    are exactly the rows the cap discards, and row_number still needs
    the full group sorted, so a production run pre-filters with an
    approximate per-domain count (the skew-salting pattern in
    operators/skew.py) before the exact window; at witness scale the
    plain window is the honest plan."""
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"), F.lit(".example"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(".org")).otherwise(F.lit(".com")),
        F.lit("/p/"), F.col("doc_id").cast("string"))
    host = F.regexp_extract(url, r"^https?://([^/]+)", 1)
    domain = F.regexp_replace(host, r"^www\.", "")
    w = Window.partitionBy("domain").orderBy(
        F.col("n_chars").desc(), F.col("doc_id"))
    return (d.select("doc_id", "n_chars", domain.alias("domain"))
            .withColumn("rk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rk") <= cap)
            .select("doc_id", "domain", "rk"))


def sql_domain_cap(cap: int = 5) -> str:
    return f"""
WITH u AS (
  SELECT doc_id, n_chars,
         'https://' || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
         || source || '.example'
         || CASE WHEN doc_id % 4 = 0 THEN '.org' ELSE '.com' END
         || '/p/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
),
d AS (
  SELECT doc_id, n_chars,
         REGEXP_REPLACE(REGEXP_EXTRACT(url, '^https?://([^/]+)', 1),
                        '^www\\.', '') AS domain
  FROM u
)
SELECT doc_id, domain,
       CAST(ROW_NUMBER() OVER (PARTITION BY domain
                               ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk
FROM d
QUALIFY rk <= {cap}
"""
