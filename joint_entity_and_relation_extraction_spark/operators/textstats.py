"""Text-analysis operators for the training-data pipeline (task brief):
token counting, quality scoring, language-ID scoring, document
fingerprinting. All pure built-ins (whole-stage codegen) — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import read_table

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

    d = read_table(spark, sf_dir, "documents")
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
