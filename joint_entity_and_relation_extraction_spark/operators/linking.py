"""Entity linking L1–L6 (SURVEY.md §2.3): normalization, broadcast exact
link, MinHash-LSH fuzzy blocking, candidate scoring, top-1 selection,
deterministic node ids for unlinked surfaces.

Spark-first: normalization and Jaccard verification are built-ins; the only
Python is the shared banding/shingle kernels (functions/aliasgen.py) as
vectorized pandas UDFs — identical code on the mention side, the alias
side, and the pandas oracle, so candidate sets (and therefore links) match
the oracle exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

from ..functions import aliasgen as AG
from ..sources.io import read_table

SIM_THRESHOLD = 0.5


def normalize_col(col):
    """L1 as built-ins: lowercase, strip punctuation, collapse whitespace —
    mirrors functions.text.normalize_surface (ascii-equivalent; the corpus
    is ascii word salad, asserted in tests)."""
    c = F.lower(col)
    # (?U): Java's \w is ASCII-only by default; Python's is Unicode —
    # UNICODE_CHARACTER_CLASS aligns them (caught by the parity test on
    # accented surfaces from the entity-escape HTML template)
    c = F.regexp_replace(c, r"(?U)[^\w\s]+", " ")
    c = F.regexp_replace(c, r"(?U)\s+", " ")
    return F.trim(c)


def alias_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast alias dictionary synthesized from the corpus's own token
    distribution (FIXTURES.md §3). The token-count aggregation is
    distributed; only the tiny top-k survives to the driver — at real
    scale the dictionary is a curated side input and this function is
    replaced by a read."""
    d = read_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok").count()
        .orderBy(F.desc("count"), "tok")
        .limit(500)
        .collect()
    )
    rows = AG.build_alias_rows([(r.tok, r["count"]) for r in counts])
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["alias_norm", "entity_id", "prior"]),
        schema="alias_norm string, entity_id long, prior double")


@F.pandas_udf(ArrayType(LongType()))
def band_keys_udf(norm: pd.Series) -> pd.Series:
    return norm.map(AG.band_keys)


@F.pandas_udf(ArrayType(StringType()))
def char_shingles_udf(norm: pd.Series) -> pd.Series:
    return norm.map(AG.char_shingles)


@F.pandas_udf(LongType())
def surface_node_udf(norm: pd.Series) -> pd.Series:
    return norm.map(AG.surface_node_id)


def _best_per_mention(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("url", "sent_id", "m_id").orderBy(
        F.desc("sim"), F.desc("prior"), F.asc("entity_id"))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def link_mentions(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """mentions → links(url, sent_id, m_id, alias_norm, node_id, entity_id
    nullable, method, sim).

    Exact pass: broadcast hash join on alias_norm (L2). Fuzzy pass: only
    still-unlinked DISTINCT surfaces go through LSH banding — the band
    join is an equi-join on (band, key), then exact char-3-gram Jaccard
    (array_intersect, JVM-side) verifies candidates (L3/L4); top-1 by
    (sim, prior, entity_id) per mention (L5). Unlinked surfaces get
    deterministic 63-bit surface-node ids (L6) — never
    monotonically_increasing_id.
    """
    m = mentions.withColumn("alias_norm", normalize_col(F.col("surface")))

    exact = (
        m.join(F.broadcast(aliases), "alias_norm", "left")
        .withColumn("sim", F.when(F.col("entity_id").isNotNull(), 1.0)
                    .otherwise(F.lit(None).cast("double")))
    )
    exact_best = _best_per_mention(
        exact.filter(F.col("entity_id").isNotNull()))
    exact_linked = exact_best.select(
        "url", "sent_id", "m_id", "alias_norm", "entity_id",
        F.lit("exact").alias("method"), "sim", "prior")

    unlinked = exact.filter(F.col("entity_id").isNull()).select(
        "url", "sent_id", "m_id", "alias_norm")

    # fuzzy path over DISTINCT unlinked surfaces (tiny vs mention count)
    u_surf = unlinked.select("alias_norm").distinct().withColumn(
        "m_sh", char_shingles_udf("alias_norm"))
    u_band = u_surf.select(
        "alias_norm", "m_sh",
        F.posexplode(band_keys_udf("alias_norm")).alias("band", "key"))
    a_surf = aliases.select(F.col("alias_norm").alias("a_norm"),
                            "entity_id", "prior").withColumn(
        "a_sh", char_shingles_udf("a_norm"))
    a_band = a_surf.select(
        "a_norm", "a_sh", "entity_id", "prior",
        F.posexplode(band_keys_udf("a_norm")).alias("band", "key"))
    inter = F.size(F.array_intersect("m_sh", "a_sh")).cast("double")
    union = (F.size("m_sh") + F.size("a_sh")).cast("double") - inter
    cand = (
        u_band.join(F.broadcast(a_band), ["band", "key"])
        .dropDuplicates(["alias_norm", "a_norm", "entity_id"])
        .withColumn("sim", F.round(inter / union, 6))
        .filter(F.col("sim") >= SIM_THRESHOLD)
        .select("alias_norm", "entity_id", "prior", "sim")
    )
    fuzzy = _best_per_mention(unlinked.join(cand, "alias_norm"))
    fuzzy_linked = fuzzy.select(
        "url", "sent_id", "m_id", "alias_norm", "entity_id",
        F.lit("lsh").alias("method"), "sim", "prior")

    linked = exact_linked.unionByName(fuzzy_linked)
    still_unlinked = unlinked.join(
        cand.select("alias_norm").distinct(), "alias_norm", "left_anti"
    ).select(
        "url", "sent_id", "m_id", "alias_norm",
        F.lit(None).cast("long").alias("entity_id"),
        F.lit("none").alias("method"),
        F.lit(None).cast("double").alias("sim"),
        F.lit(None).cast("double").alias("prior"))

    return (
        linked.unionByName(still_unlinked)
        .withColumn("node_id",
                    F.coalesce(F.col("entity_id"),
                               surface_node_udf(F.col("alias_norm"))))
    )


def link_edges(links: DataFrame) -> DataFrame:
    """C1: same-entity evidence edges (surface_node ↔ entity) for every
    linked surface — ambiguous aliases connect their entities through the
    shared surface node, which canonicalization then merges."""
    return (
        links.filter(F.col("entity_id").isNotNull())
        .select(surface_node_udf(F.col("alias_norm")).alias("src"),
                F.col("entity_id").alias("dst"))
        .dropDuplicates()
    )
