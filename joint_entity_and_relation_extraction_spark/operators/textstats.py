"""Text-analysis operators for the training-data pipeline (task brief):
token counting, quality scoring, language-ID scoring, document
fingerprinting. All pure built-ins (whole-stage codegen) — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import read_docs, read_table

# small function-word profiles per language (public knowledge)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "fr": ["le", "la", "et", "de", "un", "une", "est", "que"],
    "es": ["el", "la", "y", "de", "un", "una", "es", "que"],
    "de": ["der", "die", "und", "das", "ein", "ist", "nicht", "zu"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}


def _words():
    return F.split(F.col("text"), " ")


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate (wordpiece-style
    regex pieces: runs of letters / digits / single punctuation)."""
    d = read_table(spark, sf_dir, "documents")
    pieces = F.expr(r"size(filter(split(text, '[^\\pL\\pN]+'), x -> x <> ''))")
    return d.select(
        "doc_id",
        F.size(_words()).cast("bigint").alias("n_ws_tokens"),
        F.size(F.array_distinct(_words())).cast("bigint").alias("n_distinct"),
        pieces.cast("bigint").alias("n_wordish"),
        F.length("text").cast("bigint").alias("n_chars_m"),
    )


SQL_TOKEN_STATS = r"""
SELECT doc_id,
       CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_distinct,
       CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '[^a-zA-Z0-9À-ɏ一-鿿]+'),
                            x -> x <> '')) AS BIGINT) AS n_wordish,
       CAST(LENGTH(text) AS BIGINT) AS n_chars_m
FROM documents
"""


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features: distinct-token ratio, mean word length,
    uppercase ratio — the usual cheap pre-filter columns for corpus
    curation."""
    d = read_table(spark, sf_dir, "documents")
    words = _words()
    n = F.size(words).cast("double")
    avg_len = F.expr(
        "aggregate(split(text, ' '), 0L, (a, x) -> a + length(x))"
    ).cast("double") / n
    return d.select(
        "doc_id",
        F.round((F.size(F.array_distinct(words)).cast("double") / n), 6)
        .alias("distinct_ratio"),
        F.round(avg_len, 6).alias("avg_word_len"),
        F.round(
            F.length(F.regexp_replace("text", "[^A-Z]", "")).cast("double")
            / F.length("text"), 6).alias("upper_ratio"),
    )


SQL_QUALITY_SCORES = """
SELECT doc_id,
       ROUND(CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
             / LEN(STRING_SPLIT(text, ' ')), 6) AS distinct_ratio,
       ROUND(CAST(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(text, ' '),
                                          x -> LENGTH(x))) AS DOUBLE)
             / LEN(STRING_SPLIT(text, ' ')), 6) AS avg_word_len,
       ROUND(CAST(LENGTH(REGEXP_REPLACE(text, '[^A-Z]', '', 'g')) AS DOUBLE)
             / LENGTH(text), 6) AS upper_ratio
FROM documents
"""


def langid_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function-word hit counts per language — the oracle-checkable half of
    language ID (argmax lives in langid_predict)."""
    d = read_table(spark, sf_dir, "documents")
    cols = [F.col("doc_id"), F.col("lang").alias("lang_meta")]
    for lg, markers in sorted(LANG_MARKERS.items()):
        arr = ", ".join(f"'{m}'" for m in markers)
        cols.append(
            F.expr(f"size(filter(split(lower(text), ' '), "
                   f"x -> array_contains(array({arr}), x)))")
            .cast("bigint").alias(f"hits_{lg}"))
    return d.select(*cols)


def _sql_langid_scores() -> str:
    parts = []
    for lg, markers in sorted(LANG_MARKERS.items()):
        arr = ", ".join(f"'{m}'" for m in markers)
        parts.append(
            f"CAST(LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), "
            f"x -> LIST_CONTAINS([{arr}], x))) AS BIGINT) AS hits_{lg}")
    return ("SELECT doc_id, lang AS lang_meta, " + ", ".join(parts)
            + " FROM documents")


SQL_LANGID_SCORES = _sql_langid_scores()


def langid_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax over the marker-hit vector with deterministic lang-code
    tie-break (struct array_max: compares (hits, rev_lang) field-wise)."""
    scores = langid_scores(spark, sf_dir)
    structs = F.array(*[
        F.struct(F.col(f"hits_{lg}").alias("hits"),
                 F.lit(lg).alias("lang"))
        for lg in sorted(LANG_MARKERS)])
    best = F.array_max(structs)
    return scores.select(
        "doc_id", "lang_meta", best["lang"].alias("lang_pred"),
        best["hits"].alias("best_hits"))


def _sql_langid_predict() -> str:
    """Argmax mirror of langid_predict: DuckDB structs compare
    lexicographically by field order exactly like Spark's array_max over
    (hits, lang) structs, so LIST_MAX over the same structs reproduces
    the tie-break bit-for-bit (GREATEST rejects struct args)."""
    structs = ", ".join(
        f"{{'hits': hits_{lg}, 'lang': '{lg}'}}"
        for lg in sorted(LANG_MARKERS))
    return (f"WITH s AS ({SQL_LANGID_SCORES}) "
            f"SELECT doc_id, lang_meta, "
            f"(LIST_MAX([{structs}])).lang AS lang_pred, "
            f"(LIST_MAX([{structs}])).hits AS best_hits FROM s")


SQL_LANGID_PREDICT = _sql_langid_predict()


def winnow_fingerprint(spark: SparkSession, sf_dir: str, k: int = 5,
                       w: int = 8) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken):
    hash every word k-gram, then in each sliding window of w consecutive
    hashes select the minimum (rightmost on ties) — any two documents
    sharing a run of w+k-1 words share a fingerprint, which makes the
    selected (pos, hash) rows a provable near-dup blocking key at a
    fraction of the k-gram volume.

    Entirely JVM-side: k-gram hashing is xxhash64 inside a transform(),
    the window minimum is a struct-min over (hash, -pos) — tie →
    smallest -pos → RIGHTMOST position, the robust-winnowing rule — and
    short documents (< w k-grams) degrade to their global minimum.
    Rows-only for the driver (no xxhash64 in DuckDB); exact parity vs a
    python reference winnower is pytest-gated."""
    from pyspark.sql import Window

    d = read_docs(spark, sf_dir)
    words = _words()
    n = F.size(words)
    kgrams = F.when(n >= k, F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i, k)))
    )).otherwise(F.array().cast("array<bigint>"))
    ex = d.select("doc_id", F.posexplode(kgrams).alias("pos", "h"))
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    sel = (ex
           .withColumn("m", F.min(F.struct(
               F.col("h"), (-F.col("pos")).alias("np"))).over(win))
           .withColumn("nkg", F.count("*").over(Window.partitionBy("doc_id"))))
    return (sel.filter(F.col("pos") <= F.greatest(F.col("nkg") - w, F.lit(0)))
            .select("doc_id",
                    (-F.col("m.np")).cast("bigint").alias("fp_pos"),
                    F.col("m.h").alias("fp_hash"))
            .distinct())


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over case/whitespace-normalized text plus
    a length bucket — the key for fuzzy-exact dedup at scale."""
    d = read_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_fp"),
        (F.floor(F.length("text") / 100) * 100).cast("bigint").alias("len_bucket"),
    )


SQL_FINGERPRINT = r"""
SELECT doc_id, MD5(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')) AS norm_fp,
       CAST(FLOOR(LENGTH(text) / 100) * 100 AS BIGINT) AS len_bucket
FROM documents
"""


def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1, adapted to
    word level for the single-line synthetic corpus): fraction of the
    document taken by its most frequent word, duplicate-word fraction,
    and duplicate-2-gram fraction. The top-word count needs a per-word
    tally, done as explode → two-level groupBy (map-side combinable at
    100 TB: (doc_id, word) keys are near-unique so partial aggregation
    collapses most rows before the shuffle); the 2-gram distinct ratio
    never leaves the words array (zip_with + array_distinct, whole-stage
    codegen, zero extra shuffle)."""
    d = read_docs(spark, sf_dir).select(
        "doc_id", _words().alias("ws"))
    counts = (d.select("doc_id", F.explode("ws").alias("w"))
              .groupBy("doc_id", "w").agg(F.count("*").alias("c")))
    per_doc = counts.groupBy("doc_id").agg(
        F.max("c").alias("top_c"),
        F.sum("c").alias("n_words"),
        F.count("*").alias("n_distinct"))
    grams = d.select(
        "doc_id",
        F.size("ws").alias("n"),
        F.size(F.array_distinct(F.expr(
            "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1), "
            "(a, b) -> concat(a, ' ', b))"))).alias("d2"))
    return (per_doc.join(grams, "doc_id")
            .select(
                "doc_id",
                F.col("n_words").cast("bigint").alias("n_words"),
                F.round(F.col("top_c").cast("double") / F.col("n_words"), 6)
                .alias("top_word_frac"),
                F.round(F.lit(1.0) - F.col("n_distinct").cast("double")
                        / F.col("n_words"), 6).alias("dup_word_frac"),
                F.round(F.when(F.col("n") > 1,
                               F.lit(1.0) - F.col("d2").cast("double")
                               / (F.col("n") - 1)).otherwise(0.0), 6)
                .alias("dup_2gram_frac")))


SQL_REPETITION_SCORES = """
WITH w AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
           FROM documents),
c AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY 1, 2),
pd AS (SELECT doc_id, MAX(c) AS top_c,
              CAST(SUM(c) AS BIGINT) AS n_words,
              COUNT(*) AS n_distinct
       FROM c GROUP BY 1),
g AS (SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS n,
             LEN(LIST_DISTINCT(LIST_TRANSFORM(
                 RANGE(1, LEN(STRING_SPLIT(text, ' '))),
                 i -> STRING_SPLIT(text, ' ')[i] || ' '
                      || STRING_SPLIT(text, ' ')[i + 1]))) AS d2
      FROM documents)
SELECT pd.doc_id, pd.n_words,
       ROUND(CAST(top_c AS DOUBLE) / n_words, 6) AS top_word_frac,
       ROUND(1 - CAST(n_distinct AS DOUBLE) / n_words, 6) AS dup_word_frac,
       ROUND(CASE WHEN g.n > 1
                  THEN 1 - CAST(d2 AS DOUBLE) / (g.n - 1)
                  ELSE 0.0 END, 6) AS dup_2gram_frac
FROM pd JOIN g ON pd.doc_id = g.doc_id
"""


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram language-model scoring — the cheap perplexity proxy
    used as a quality filter (CCNet-style, Wenzek et al. 2019): train
    word → count over the WHOLE corpus, then score each document by the
    mean negative log2 probability of its word occurrences. Two
    shuffles total (word tally, per-doc mean); the LM join is a plain
    equi-join — broadcast it when the vocabulary fits (fixture scale),
    shuffle-join when a 100 TB corpus's vocabulary doesn't. The scalar
    corpus total stays in-plan via a broadcast single-row cross join
    (no driver collect)."""
    w = (read_docs(spark, sf_dir)
         .select("doc_id", F.explode(_words()).alias("w")))
    lm = w.groupBy("w").agg(F.count("*").alias("c"))
    tot = w.groupBy().agg(F.count("*").alias("tot"))
    scored = (w.join(lm, "w")
              .crossJoin(F.broadcast(tot))
              .select("doc_id", (F.log2("tot") - F.log2("c")).alias("nlp")))
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_words"),
        F.round(F.avg("nlp"), 6).alias("avg_neg_log2p"))


SQL_UNIGRAM_LOGPROB = """
WITH w AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
           FROM documents),
lm AS (SELECT w, COUNT(*) AS c FROM w GROUP BY 1),
t AS (SELECT COUNT(*) AS tot FROM w)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       ROUND(AVG(LOG2(t.tot) - LOG2(lm.c)), 6) AS avg_neg_log2p
FROM w JOIN lm USING (w), t
GROUP BY doc_id
"""


#: ASCII-only classes on purpose: Java regex \d and RE2 \d are both
#: ASCII, so the same pattern string means the same thing to both engines
_PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_PHONE_RE = r"[0-9]{3}-[0-9]{4}"


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction counts (emails, phone-shaped numbers).
    The synthetic corpus carries no PII, so the witness first splices
    deterministic synthetic PII into a slice of the documents (same
    expression on both engines) — the operator under test is the
    count + redact stage: regexp_extract_all for per-kind counts,
    chained regexp_replace for the redacted text (returned as its md5 so
    the row stays scalar-hashable). Pure whole-stage-codegen built-ins;
    at 100 TB this is a map-only pass with no shuffle."""
    d = read_table(spark, sf_dir, "documents")
    t2 = (F.when(F.col("doc_id") % 3 == 0,
                 F.concat("text", F.lit(" contact u"),
                          F.col("doc_id").cast("string"),
                          F.lit("@example.com")))
          .otherwise(F.col("text")))
    t2 = (F.when(F.col("doc_id") % 5 == 0,
                 F.concat(t2, F.lit(" call 555-01"),
                          F.lpad((F.col("doc_id") % 100).cast("string"),
                                 2, "0")))
          .otherwise(t2))
    redacted = F.regexp_replace(
        F.regexp_replace(t2, _PII_EMAIL_RE, "<EMAIL>"),
        _PII_PHONE_RE, "<PHONE>")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(t2, F.lit(_PII_EMAIL_RE), 0))
        .cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(t2, F.lit(_PII_PHONE_RE), 0))
        .cast("bigint").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"))


SQL_PII_SCRUB = f"""
WITH t1 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' contact u' || CAST(doc_id AS VARCHAR)
                   || '@example.com'
              ELSE text END AS t2a
  FROM documents),
t AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN t2a || ' call 555-01'
                   || LPAD(CAST(doc_id % 100 AS VARCHAR), 2, '0')
              ELSE t2a END AS t2
  FROM t1)
SELECT doc_id,
       CAST(LEN(REGEXP_EXTRACT_ALL(t2, '{_PII_EMAIL_RE}')) AS BIGINT)
           AS n_emails,
       CAST(LEN(REGEXP_EXTRACT_ALL(t2, '{_PII_PHONE_RE}')) AS BIGINT)
           AS n_phones,
       MD5(REGEXP_REPLACE(REGEXP_REPLACE(t2, '{_PII_EMAIL_RE}', '<EMAIL>',
                                         'g'),
                          '{_PII_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM t
"""


def length_histogram(spark: SparkSession, sf_dir: str,
                     bucket: int = 64) -> DataFrame:
    """Sequence-length distribution — the histogram a packing/curriculum
    stage reads before choosing context budgets. Integer-div bucketing
    (no float), single map-side-combinable groupBy."""
    d = read_table(spark, sf_dir, "documents")
    return (d.select(F.expr(f"n_chars div {bucket}").alias("len_bucket"),
                     "n_chars")
            .groupBy("len_bucket")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars"),
                 F.round(F.avg("n_chars"), 6).alias("avg_chars")))


def sql_length_histogram(bucket: int = 64) -> str:
    return f"""
SELECT n_chars // {bucket} AS len_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
       ROUND(AVG(n_chars), 6) AS avg_chars
FROM documents GROUP BY 1
"""


def ngram_topk(spark: SparkSession, sf_dir: str, n: int = 2,
               k: int = 50) -> DataFrame:
    """Corpus-level top-k word n-grams by document frequency — the
    heavy-hitter profile a curation pipeline reads before choosing
    boilerplate filters and shingle df caps (dedup.MAX_SHINGLE_DF).
    Distinct-per-doc explode → map-side-combinable count → global top-k
    with a total tie order (count desc, gram asc) so the cut is
    deterministic and oracle-equal. At 100 TB the count is a partial
    agg and the top-k is a single bounded sort-limit (Spark's
    TakeOrderedAndProject), not a full sort."""
    d = read_docs(spark, sf_dir)
    grams = F.array_distinct(F.expr(
        "zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1), "
        "slice(split(text, ' '), 2, size(split(text, ' ')) - 1), "
        "(a, b) -> concat(a, ' ', b))")) if n == 2 else None
    assert n == 2, "witness fixes n=2; generalize via _shingles_expr"
    return (d.select(F.explode(grams).alias("gram"))
            .groupBy("gram").agg(F.count("*").cast("bigint").alias("df"))
            .orderBy(F.desc("df"), F.asc("gram"))
            .limit(k))


def sql_ngram_topk(k: int = 50) -> str:
    return f"""
WITH g AS (
  SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
      RANGE(1, LEN(STRING_SPLIT(text, ' '))),
      i -> STRING_SPLIT(text, ' ')[i] || ' '
           || STRING_SPLIT(text, ' ')[i + 1]))) AS gram
  FROM documents)
SELECT gram, CAST(COUNT(*) AS BIGINT) AS df
FROM g GROUP BY gram
ORDER BY df DESC, gram ASC
LIMIT {k}
"""


# --- BM25 retrieval scoring -------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
#: default witness query — terms present in the synthetic fixture vocab
BM25_TERMS = ("query", "join", "table")


def bm25_topk(spark: SparkSession, sf_dir: str,
              terms: tuple = BM25_TERMS, k: int = 20) -> DataFrame:
    """Okapi BM25 document scoring for a term-set query (r06, staged
    registered in the r07 rotation) — the retrieval primitive corpus curation uses to pull
    topical slices (and the missing sibling of the unigram-LM scorer
    above). Three shuffles: doc lengths, per-(doc, term) tf, per-term df;
    the corpus scalars (avgdl, n_docs) ride a broadcast single-row cross
    join exactly like unigram_logprob's total — no driver collect. The
    term filter lands BEFORE the tf aggregate, so the scored stream is
    O(docs containing a query term), not O(corpus words). Deterministic
    top-k: (bm25 desc, doc_id) with both engines ranking the same
    round6 scores."""
    w = (read_docs(spark, sf_dir)
         .select("doc_id", F.explode(_words()).alias("w"))
         .localCheckpoint(eager=False))  # feeds dl AND tf
    dl = w.groupBy("doc_id").agg(F.count("*").alias("dl"))
    corpus = dl.groupBy().agg(F.avg("dl").alias("avgdl"),
                              F.count("*").alias("n_docs"))
    tf = (w.filter(F.col("w").isin(*terms))
          .groupBy("doc_id", "w").agg(F.count("*").alias("tf")))
    df = tf.groupBy("w").agg(F.count("*").alias("df"))  # (doc,w) distinct
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    denom = (F.col("tf")
             + BM25_K1 * (1.0 - BM25_B
                          + BM25_B * F.col("dl") / F.col("avgdl")))
    contrib = idf * F.col("tf") * (BM25_K1 + 1.0) / denom
    scored = (tf.join(df, "w").join(dl, "doc_id")
              .crossJoin(F.broadcast(corpus))
              .select("doc_id", contrib.alias("contrib")))
    return (scored.groupBy("doc_id")
            .agg(F.round(F.sum("contrib"), 6).alias("bm25"),
                 F.count("*").cast("bigint").alias("n_terms_hit"))
            .orderBy(F.col("bm25").desc(), F.col("doc_id"))
            .limit(k))


def sql_bm25_topk(terms: tuple = BM25_TERMS, k: int = 20) -> str:
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH w AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
           FROM documents),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM w GROUP BY doc_id),
corpus AS (SELECT AVG(dl) AS avgdl, COUNT(*) AS n_docs FROM dl),
tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM w
       WHERE w IN ({tl}) GROUP BY doc_id, w),
df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
scored AS (
  SELECT tf.doc_id,
         LN((corpus.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * ({BM25_K1} + 1.0)
           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
              + {BM25_B} * dl.dl / corpus.avgdl)) AS contrib
  FROM tf JOIN df USING (w) JOIN dl USING (doc_id), corpus
)
SELECT doc_id, ROUND(SUM(contrib), 6) AS bm25,
       CAST(COUNT(*) AS BIGINT) AS n_terms_hit
FROM scored GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT {k}
"""


BIGRAM_LAMBDA = 0.8  # interpolation weight on the bigram term


def bigram_logprob(spark: SparkSession, sf_dir: str,
                   lam: float = BIGRAM_LAMBDA) -> DataFrame:
    """Interpolated bigram language-model scoring (r07, staged for the
    r08 rotation) — the next step up from :func:`unigram_logprob` toward
    the KenLM-style perplexity filters production curation runs (CCNet,
    Wenzek et al. 2019): P(w2|w1) = lam * c(w1 w2)/c(w1) +
    (1-lam) * c(w2)/total, scored as the per-document mean negative
    log2 over its bigram occurrences.

    Scale shape: bigrams are built INSIDE the row via zip_with over the
    word array (no positional self-join — a posexplode+join would add a
    corpus-wide shuffle). The LM itself is assembled on the
    VOCABULARY-sized tables (r08, guide §2.3 "shuffle keys and metadata
    instead of payloads"): bigram counts join unigram counts and the
    broadcast corpus total into one (w1, w2) → -log2(p) score table, and
    the corpus bigram stream is then joined back exactly ONCE on that
    key — the r07 shape joined the full per-occurrence stream three
    times (big, u1, u2), i.e. three corpus-wide shuffles where one
    suffices. Per-occurrence nlp values are bit-identical (same
    expression over the same c12/c1/c2/tot inputs). The words frame
    feeds the unigram LM and the bigram stream → localCheckpoint
    (CLAUDE.md two-consumer invariant)."""
    d = (read_docs(spark, sf_dir)
         .select("doc_id", _words().alias("ws"))
         .localCheckpoint(eager=False))  # feeds unigram AND bigram streams
    w = d.select("doc_id", F.explode("ws").alias("w"))
    # ONE unigram tally (r08): the vocabulary table feeds both LM sides
    # (u1, u2) → localCheckpoint; the corpus total is the exact integer
    # SUM of its counts (vocabulary-sized aggregate), not a third full
    # pass over the word stream — the r07 shape ran the explode+tally
    # twice and the global count once more.
    uni = (w.groupBy("w").agg(F.count("*").alias("c"))
           .localCheckpoint(eager=False))
    tot = uni.groupBy().agg(F.sum("c").alias("tot"))
    bg_expr = F.expr(
        "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),"
        " (a, b) -> struct(a as w1, b as w2))")
    bg = (d.select("doc_id", F.explode(bg_expr).alias("b"))
          .select("doc_id", F.col("b.w1").alias("w1"),
                  F.col("b.w2").alias("w2")))
    big = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    p = (F.lit(lam) * F.col("c12") / F.col("c1")
         + F.lit(1.0 - lam) * F.col("c2") / F.col("tot"))
    lm = (big.join(u1, "w1").join(u2, "w2")
          .crossJoin(F.broadcast(tot))
          .select("w1", "w2", (-F.log2(p)).alias("nlp")))
    scored = bg.join(lm, ["w1", "w2"]).select("doc_id", "nlp")
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.round(F.avg("nlp"), 6).alias("avg_neg_log2p"))


def sql_bigram_logprob(lam: float = BIGRAM_LAMBDA) -> str:
    return f"""
WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
w AS (SELECT doc_id, UNNEST(ws) AS w FROM d),
uni AS (SELECT w, COUNT(*) AS c FROM w GROUP BY w),
t AS (SELECT COUNT(*) AS tot FROM w),
bg AS (SELECT doc_id, UNNEST(list_transform(range(1, len(ws)),
                                            i -> ws[i])) AS w1,
              UNNEST(list_transform(range(1, len(ws)),
                                    i -> ws[i + 1])) AS w2
       FROM d),
big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(-LOG2({lam} * big.c12 / u1.c
                       + {1.0 - lam} * u2.c / t.tot)), 6) AS avg_neg_log2p
FROM bg
JOIN big USING (w1, w2)
JOIN uni u1 ON u1.w = bg.w1
JOIN uni u2 ON u2.w = bg.w2, t
GROUP BY doc_id
"""


#: vocabulary cut for the Zipf fit — rank tail is noise at any corpus size
ZIPF_TOP_N = 200


def zipf_slope(spark: SparkSession, sf_dir: str,
               top_n: int = ZIPF_TOP_N) -> DataFrame:
    """Corpus Zipfian-fit diagnostic (r07, staged for r08): OLS slope of
    log2(count) on log2(rank) over the top-N vocabulary — natural text
    sits near -1; templated/generated corpora drift toward 0 (flat) or
    below -1.5 (spiky), so the slope is a one-number corpus-health
    check curation dashboards track. Also exercises the regression
    aggregates (regr_slope/regr_intercept/regr_r2) end-to-end.

    Scale shape: one map-side-combinable word tally, a top-N rank
    window over the (vocabulary-sized, not corpus-sized) count table,
    then a single-row regression aggregate. Ties rank deterministically
    by word so both engines fit the same N points."""
    from pyspark.sql import Window

    w = (read_docs(spark, sf_dir)
         .select(F.explode(_words()).alias("w")))
    counts = w.groupBy("w").agg(F.count("*").alias("c"))
    rk = Window.orderBy(F.col("c").desc(), F.col("w"))
    top = (counts.withColumn("rank", F.row_number().over(rk))
           .filter(F.col("rank") <= top_n)
           .select(F.log2("rank").alias("x"), F.log2("c").alias("y")))
    return top.agg(
        F.round(F.regr_slope("y", "x"), 6).alias("zipf_slope"),
        F.round(F.regr_intercept("y", "x"), 6).alias("zipf_intercept"),
        F.round(F.regr_r2("y", "x"), 6).alias("zipf_r2"),
        F.count("*").cast("bigint").alias("n_points"))


def sql_zipf_slope(top_n: int = ZIPF_TOP_N) -> str:
    return f"""
WITH w AS (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents),
counts AS (SELECT w, COUNT(*) AS c FROM w GROUP BY w),
top AS (
  SELECT LOG2(ROW_NUMBER() OVER (ORDER BY c DESC, w)) AS x, LOG2(c) AS y
  FROM counts
  QUALIFY ROW_NUMBER() OVER (ORDER BY c DESC, w) <= {top_n}
)
SELECT ROUND(REGR_SLOPE(y, x), 6) AS zipf_slope,
       ROUND(REGR_INTERCEPT(y, x), 6) AS zipf_intercept,
       ROUND(REGR_R2(y, x), 6) AS zipf_r2,
       CAST(COUNT(*) AS BIGINT) AS n_points
FROM top
"""


def tfidf_topk(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Per-document tf-idf keyword extraction (r07, staged for r08) —
    the labeling primitive curation uses for topical routing (BM25
    above answers "which docs for this query"; this answers "which
    terms for this doc"). tf = in-doc count, idf = ln(n_docs / df)
    over distinct-doc frequency; deterministic top-k per doc by
    (tfidf desc, term).

    Scale shape: one word tally keyed (doc_id, w) — map-side
    combinable — a df aggregate over its (vocabulary × doc) projection,
    an equi-join back on the word key, corpus scalar via broadcast
    single-row cross join, and the standard top-k-per-group window on
    doc_id. No all-pairs, no Python."""
    from pyspark.sql import Window

    tf = (read_docs(spark, sf_dir)
          .select("doc_id", F.explode(_words()).alias("w"))
          .groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
          .localCheckpoint(eager=False))  # feeds df agg AND the join
    df = tf.groupBy("w").agg(F.count("*").alias("df"))
    nd = tf.groupBy().agg(F.countDistinct("doc_id").alias("n_docs"))
    tfidf = F.round(F.col("tf")
                    * F.log(F.col("n_docs") / F.col("df")), 6)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term"))
    return (tf.join(df, "w").crossJoin(F.broadcast(nd))
            .select("doc_id", F.col("w").alias("term"),
                    tfidf.alias("tfidf"))
            .withColumn("rk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rk") <= k))


def sql_tfidf_topk(k: int = 3) -> str:
    return f"""
WITH tf AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents
),
tfc AS (SELECT doc_id, w, COUNT(*) AS tf FROM tf GROUP BY doc_id, w),
dfc AS (SELECT w, COUNT(*) AS df FROM tfc GROUP BY w),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tfc)
SELECT doc_id, term, tfidf, rk FROM (
  SELECT tfc.doc_id, tfc.w AS term,
         ROUND(tfc.tf * LN(nd.n_docs / dfc.df), 6) AS tfidf,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY tfc.doc_id
           ORDER BY ROUND(tfc.tf * LN(nd.n_docs / dfc.df), 6) DESC, tfc.w
         ) AS BIGINT) AS rk
  FROM tfc JOIN dfc USING (w), nd
)
WHERE rk <= {k}
"""
