"""SRC5: the WARC-lite Python Data Source (Spark 4 datasource API) —
round-trip parity, file-level partitioning, and integration with the
extraction chain."""

import pytest

from joint_entity_and_relation_extraction_spark.sources import warclite as W

from conftest import SF001


def _fixture_rows(spark, n=60):
    """Deterministic crawl records derived from the fixture corpus —
    includes multi-line payloads and payloads containing header-ish
    lines to stress the record splitter."""
    from joint_entity_and_relation_extraction_spark.operators.webpages import web_pages

    rows = (web_pages(spark, SF001).select("url", "warc_ts", "lang", "html")
            .orderBy("url").limit(n).collect())
    # WARC-Date is a header STRING in the archive; payloads are bytes
    return [(r.url, r.warc_ts.isoformat(), r.lang, bytes(r.html))
            for r in rows]


@pytest.fixture(scope="module")
def crawl_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("crawl")
    rows = _fixture_rows(spark)
    W.write_warclite(rows, str(d), n_files=4)
    return str(d), rows


def test_warclite_roundtrip_exact(spark, crawl_dir):
    d, rows = crawl_dir
    spark.dataSource.register(W.WarcLiteDataSource)
    got = (spark.read.format("warclite").option("path", d).load()
           .orderBy("url").collect())
    assert [(r.url, r.warc_ts, r.lang, bytes(r.html))
            for r in got] == sorted(rows)


def test_warclite_partitions_are_files(spark, crawl_dir):
    d, rows = crawl_dir
    spark.dataSource.register(W.WarcLiteDataSource)
    df = spark.read.format("warclite").option("path", d).load()
    assert df.rdd.getNumPartitions() == 4
    # per-partition counts equal the round-robin stripe sizes
    sizes = sorted(df.rdd.mapPartitions(
        lambda it: [sum(1 for _ in it)]).collect())
    n = len(rows)
    want = sorted(n // 4 + (1 if i < n % 4 else 0) for i in range(4))
    assert sizes == want


def test_warclite_payload_with_headerish_lines(tmp_path):
    """A payload line that LOOKS like a header must stay payload (only a
    literal WARC/1.0 line splits records; headers are only read before
    the first blank line)."""
    tricky = b"WARC-Date: not-a-header\n\nmore text"
    rows = [("u1", "t1", "en", tricky), ("u2", "t2", "fr", b"plain")]
    W.write_warclite(rows, str(tmp_path), n_files=1)
    got = sorted(W._parse_file(str(tmp_path / "segment-0000.warc")))
    assert got == sorted(rows)


def test_warclite_feeds_extraction_chain(spark, crawl_dir):
    """The datasource output slots directly into the extract stage —
    same columns, same downstream results as the parquet-backed path."""
    from joint_entity_and_relation_extraction_spark.operators import extract as X

    d, rows = crawl_dir
    spark.dataSource.register(W.WarcLiteDataSource)
    wp = spark.read.format("warclite").option("path", d).load()
    ext = X.extract_text(wp).select("url", "text_sha", "n_chars").collect()
    assert len(ext) == len(rows)
    assert all(r.n_chars >= 0 for r in ext)


def test_warclite_stream_picks_up_new_segments(spark, tmp_path):
    """SRC5b: the streaming reader consumes existing segments in the
    first micro-batch and ONLY newly arrived segments afterwards, with
    offsets checkpointed across restarts (exactly-once per segment)."""
    d = str(tmp_path / "drop")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [("u1", "t1", "en", b"one"), ("u2", "t2", "en", b"two")]
    W.write_warclite(rows1, d, n_files=1)
    spark.dataSource.register(W.WarcLiteDataSource)

    def drain(name):
        got: list = []

        def sink(batch_df, _bid):
            got.extend((r.url, bytes(r.html)) for r in batch_df.collect())

        q = (spark.readStream.format("warclite").option("path", d).load()
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return set(got)

    assert drain("wl1") == {("u1", b"one"), ("u2", b"two")}
    # a new segment arrives; a restarted query resumes from the offset
    # and reads ONLY the new file
    import os as _os
    rows2 = [("u3", "t3", "fr", b"three")]
    with open(_os.path.join(d, "segment-9999.warc"), "wb") as f:
        f.write(b"WARC/1.0\nWARC-Target-URI: u3\nWARC-Date: t3\n"
                b"Content-Language: fr\n\nthree\n")
    got2 = drain("wl2")
    assert got2 == {("u3", b"three")}


def test_pipeline_from_crawl_dir_equals_parquet_path(spark, tmp_path):
    """End-to-end: the FULL KG pipeline run from a WARC-lite crawl
    directory of the whole fixture corpus must produce the identical
    canonical triple set as the parquet-backed path (same html bytes →
    same extraction → same triples) — the real ingestion story."""
    from pyspark.sql import functions as F

    from joint_entity_and_relation_extraction_spark.operators.webpages import web_pages
    from joint_entity_and_relation_extraction_spark.plans.pipeline import run_pipeline

    d = str(tmp_path / "crawl")
    rows = [(r.url, r.warc_ts.isoformat(), r.lang, bytes(r.html))
            for r in web_pages(spark, SF001)
            .select("url", "warc_ts", "lang", "html").collect()]
    W.write_warclite(rows, d, n_files=4)
    spark.dataSource.register(W.WarcLiteDataSource)
    pages = (spark.read.format("warclite").option("path", d).load()
             .withColumn("warc_ts", F.to_timestamp("warc_ts")))
    res = run_pipeline(spark, SF001, str(tmp_path / "kg_warc"),
                       run_id="warc1", pages=pages)
    got = {(r.subj, r.pred, r.obj, r.evidence_count)
           for r in res["triples"].collect()}
    ref = run_pipeline(spark, SF001, str(tmp_path / "kg_parq"),
                       run_id="parq1")
    want = {(r.subj, r.pred, r.obj, r.evidence_count)
            for r in ref["triples"].collect()}
    assert got == want and len(got) > 1000
