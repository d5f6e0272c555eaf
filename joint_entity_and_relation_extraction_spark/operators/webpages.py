"""web_pages fixture table as a Spark stage (FIXTURES.md §2).

Derives the BASELINE.json input-hint table
``(url, warc_ts, html:binary, text, lang)`` from the driver-provided
``documents`` parquet, deterministically (no external data). The HTML
synthesis kernel is shared with the pandas oracle
(functions/webgen.py), so both paths see identical bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, StringType, StructField,
                               StructType, TimestampType)

from ..functions import webgen
from ..sources.io import read_table

WEB_PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("html", BinaryType(), False),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])


def _gen(skew: bool):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                webgen.web_page_row(r.doc_id, r.text, r.lang, r.source, skew=skew)
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )
    return gen


def web_pages(spark: SparkSession, sf_dir: str, skew: bool = False,
              num_partitions: int | None = None,
              replicate: int = 1, mutate: bool = False) -> DataFrame:
    """documents → web_pages via an Arrow mapInPandas stage.

    Column-pruned scan (only the 4 needed columns reach the parquet
    reader); repartitioned by doc_id hash so downstream per-page work
    spreads independently of source-file layout — at 100 TB this is the
    scan-side parallelism knob (SURVEY.md §4.4).

    ``replicate=k`` deterministically multiplies the corpus ×k with
    disjoint doc_id ranges (distinct urls) — bench volume only
    (BASELINE.md allows deterministic ×K replication).

    ``mutate=True`` (bench only): odd-numbered replicas get a per-copy
    token suffix spliced into roughly every 11th word, JVM-side. Plain xK
    replication collapses sentence-level inference dedup to a ~2% distinct
    residue; mutation pushes the residue to ~50% — the ballpark of real
    Common-Crawl near-duplication — so dedup-ON throughput is measured on
    a corpus where dedup does realistic (not miraculous) work
    (VERDICT r02 'What's wrong' #3). Deterministic: the marker is
    (rep, doc_id)-keyed, no RNG."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    if num_partitions is None:
        # the testdata parquet is 1-2 files; without an explicit rebalance
        # every downstream Arrow stage would inherit that near-serial
        # partitioning (measured: 32 cores ran at local[8] speed)
        num_partitions = 2 * spark.sparkContext.defaultParallelism
    # repartition BEFORE the replicate cross-join: the shuffle then moves
    # only the base corpus (one small scan task), and the xK expansion is
    # a narrow broadcast join that runs inside every partition in
    # parallel. Expanding first serialized the whole xK corpus through
    # the single scan task's shuffle write (measured ~30s at x64 — the
    # Amdahl term that capped N->4N efficiency).
    docs = docs.repartition(num_partitions, F.col("doc_id"))
    if replicate > 1:
        reps = spark.range(replicate).select(F.col("id").alias("rep"))
        docs = (docs.crossJoin(F.broadcast(reps))
                .withColumn("doc_id",
                            F.col("doc_id") + F.col("rep") * 10_000_000))
        if mutate:
            marker = F.concat(F.lit("q"), F.col("doc_id").cast("string"))
            mutated = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w, i: F.when(i % 11 == 5,
                                        F.concat(w, marker)).otherwise(w)),
                " ")
            docs = docs.withColumn(
                "text",
                F.when(F.col("rep") % 2 == 1, mutated)
                .otherwise(F.col("text")))
        docs = docs.drop("rep")
    return docs.mapInPandas(_gen(skew), schema=WEB_PAGES_SCHEMA)
