"""Incremental page ingest via Structured Streaming (SURVEY.md §2.6).

The reference is batch-only research code [PK-H]; these operators exist
because the engine ingests Common-Crawl-style pages incrementally. All run
over the same web_pages schema; the batch extraction operators are reused
unchanged inside foreachBatch (micro-batch = small batch), which is what
makes the sink exactly-once: the checkpointLocation dedups replayed
batches across clean restarts, and each micro-batch commit carries an
idempotency tag in the IcebergLite manifest so a replay that raced a
crash between commit and checkpoint is skipped, not re-appended.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import extract as X
from ..operators.webpages import WEB_PAGES_SCHEMA
from ..sources import iceberglite as il


class MicroBatchMetricsListener:
    """StreamingQueryListener capturing per-micro-batch lineage: input
    rows, processed rates, and state-store drop counts (late data beyond
    the watermark) — the streaming analogue of the batch lineage rows
    (SURVEY.md §2.6 'late data' note). Rows accumulate in-memory and are
    flushed to the lineage table by the caller."""

    def __init__(self) -> None:
        from pyspark.sql.streaming import StreamingQueryListener

        rows = self.rows = []

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                dropped = 0
                for op in p.stateOperators:
                    dropped += getattr(op, "numRowsDroppedByWatermark", 0) or 0
                rows.append({
                    "query_id": str(p.id), "batch_id": p.batchId,
                    "input_rows": p.numInputRows,
                    "dropped_late_rows": int(dropped),
                    "timestamp": p.timestamp,
                })

            def onQueryTerminated(self, event):
                pass

            def onQueryIdle(self, event):
                pass

        self.listener = _L()

    def attach(self, spark: SparkSession) -> "MicroBatchMetricsListener":
        spark.streams.addListener(self.listener)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self.listener)


def read_page_stream(spark: SparkSession, input_dir: str,
                     max_files_per_trigger: int = 1) -> DataFrame:
    """SRC4: file-source stream over parquet chunk drops (schema required —
    no streaming inference)."""
    return (
        spark.readStream.schema(WEB_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )


def windowed_lang_counts(pages: DataFrame, window: str = "10 minutes",
                         watermark: str = "1 hour") -> DataFrame:
    """Tumbling event-time window per lang; late rows beyond the watermark
    are dropped by the state store."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("w_start"),
                F.col("w.end").alias("w_end"), "lang", "n_pages")
    )


def sliding_domain_counts(pages: DataFrame) -> DataFrame:
    domain = F.regexp_extract("url", r"https://([^/]+)/", 1)
    return (
        pages.withWatermark("warc_ts", "1 hour")
        .groupBy(F.window("warc_ts", "10 minutes", "5 minutes").alias("w"),
                 domain.alias("domain"))
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("w_start"), "domain", "n_pages")
    )


def session_windows(pages: DataFrame, gap: str = "30 minutes") -> DataFrame:
    domain = F.regexp_extract("url", r"https://([^/]+)/", 1)
    return (
        pages.withWatermark("warc_ts", "1 hour")
        .groupBy(F.session_window("warc_ts", gap).alias("w"),
                 domain.alias("domain"))
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("s_start"),
                F.col("w.end").alias("s_end"), "domain", "n_pages")
    )


def dedup_recrawls(pages: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful dedup of re-crawled urls within the watermark horizon."""
    return pages.withWatermark("warc_ts", watermark) \
        .dropDuplicatesWithinWatermark(["url"])


def stream_static_enrich(pages: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static broadcast join (alias-dict-style side input)."""
    return pages.join(F.broadcast(dim), "lang", "left")


def batch_extract_handler(table_root: str):
    """The foreachBatch body of SNK3, exposed for direct testing.

    Exactly-once end-to-end: the checkpoint dedups batches on CLEAN
    restart, and the IcebergLite commit tag makes the append itself
    idempotent for the crash-between-commit-and-checkpoint replay — a
    batch_id whose tag is already in the table manifest is skipped, so
    re-running the same (batch_df, batch_id) never double-appends."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        tag = f"batch-{batch_id}"
        if tag in il.committed_tags(table_root):
            return  # replayed after a crash past the commit — already in
        ext = X.extract_text(batch_df)
        if ext.isEmpty():
            return
        il.append(ext.withColumn("batch_id", F.lit(batch_id)),
                  table_root, ["lang"], tag=tag)

    return handle


def extract_to_iceberg(pages: DataFrame, table_root: str,
                       checkpoint_dir: str):
    """SNK3: foreachBatch → batch extractor → tagged idempotent IcebergLite
    append per micro-batch (see batch_extract_handler)."""
    return (
        pages.writeStream.foreachBatch(batch_extract_handler(table_root))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
