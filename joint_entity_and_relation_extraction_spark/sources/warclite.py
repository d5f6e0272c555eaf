"""WARC-lite crawl ingestion as a Spark 4 Python Data Source (SRC5).

Web-scale KG construction starts from crawl archives, not parquet; this
module ingests a minimal WARC-shaped record format ("WARC-lite": the
header fields the pipeline actually uses, without chunked/gzip framing)
through the pyspark.sql.datasource API — the sanctioned extension point
for formats Spark has no built-in reader for, replacing ad-hoc
RDD/wholeTextFiles parsing:

    WARC/1.0
    WARC-Target-URI: <url>
    WARC-Date: <iso ts>
    Content-Language: <lang>
    <blank line>
    <html payload ... until the next WARC/1.0 line or EOF>

Scale shape: one InputPartition per archive file (crawl archives arrive
as many ~1 GB segments, so file granularity IS the parallelism, exactly
like Spark's own text sources); each partition parses ITS file only and
yields pyarrow RecordBatches (the Arrow fast path through the Python
data source — per-row python tuples would serialize one object at a
time). Nothing is collected on the driver; the file listing is
metadata. A production deployment points the same reader at real WARCs
by swapping the record splitter.

Usage:
    spark.dataSource.register(WarcLiteDataSource)
    df = (spark.read.format("warclite")
          .option("path", "/data/crawl-segments").load())
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)

#: rows per emitted arrow batch — bounds reader memory per partition
_BATCH_ROWS = 1024

SCHEMA = "url string, warc_ts string, lang string, html binary"


def write_warclite(rows, out_dir: str, n_files: int = 4) -> list[str]:
    """Test/fixture helper: write (url, warc_ts, lang, html_bytes)
    tuples as WARC-lite archive files, striped round-robin across
    ``n_files`` (the deterministic stand-in for crawl segmenting).
    Payloads are BYTES (crawl archives carry raw octets); headers are
    utf-8 text lines. Pure python — the READER is the component under
    test."""
    os.makedirs(out_dir, exist_ok=True)
    paths = [os.path.join(out_dir, f"segment-{i:04d}.warc")
             for i in range(n_files)]
    handles = [open(p, "wb") for p in paths]
    try:
        for i, (url, ts, lang, html) in enumerate(rows):
            h = handles[i % n_files]
            h.write(b"WARC/1.0\n")
            h.write(f"WARC-Target-URI: {url}\n".encode())
            h.write(f"WARC-Date: {ts}\n".encode())
            h.write(f"Content-Language: {lang}\n".encode())
            h.write(b"\n")
            # unconditional framing newline — the parser strips exactly
            # one, so payloads that themselves end in \n round-trip
            h.write(html if isinstance(html, (bytes, bytearray))
                    else str(html).encode())
            h.write(b"\n")
    finally:
        for h in handles:
            h.close()
    return paths


def _parse_file(path: str):
    """Yield (url, ts, lang, html_bytes) records from one WARC-lite
    file. Binary line streaming — memory is one record, never one file;
    payload bytes are never decoded (the downstream extractor owns
    charset handling, exactly as with real WARCs)."""
    url = ts = lang = None
    body: list[bytes] = []
    in_body = False

    def flush():
        nonlocal url, ts, lang, body, in_body
        if url is not None:
            # writer appends one framing newline after the payload
            html = b"".join(body)
            if html.endswith(b"\n"):
                html = html[:-1]
            yield (url, ts, lang, html)
        url = ts = lang = None
        body = []
        in_body = False

    with open(path, "rb") as f:
        for line in f:
            if line.rstrip(b"\n") == b"WARC/1.0":
                yield from flush()
                continue
            if in_body:
                body.append(line)
            elif line == b"\n":
                in_body = True
            elif line.startswith(b"WARC-Target-URI: "):
                url = line[len(b"WARC-Target-URI: "):].rstrip(b"\n").decode()
            elif line.startswith(b"WARC-Date: "):
                ts = line[len(b"WARC-Date: "):].rstrip(b"\n").decode()
            elif line.startswith(b"Content-Language: "):
                lang = line[len(b"Content-Language: "):].rstrip(b"\n").decode()
    yield from flush()


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcLiteReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warclite: option 'path' is required")

    def partitions(self):
        files = sorted(
            os.path.join(self.path, f) for f in os.listdir(self.path)
            if f.endswith(".warc"))
        if not files:
            raise ValueError(f"warclite: no .warc files under {self.path}")
        return [_FilePartition(p) for p in files]

    def read(self, partition):
        import pyarrow as pa

        cols: list[list] = [[], [], [], []]
        for rec in _parse_file(partition.path):
            for c, v in zip(cols, rec):
                c.append(v)
            if len(cols[0]) >= _BATCH_ROWS:
                yield pa.record_batch(
                    cols, names=["url", "warc_ts", "lang", "html"])
                cols = [[], [], [], []]
        if cols[0]:
            yield pa.record_batch(
                cols, names=["url", "warc_ts", "lang", "html"])


class WarcLiteDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warclite"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> WarcLiteReader:
        return WarcLiteReader(self.options)

    def simpleStreamReader(self, schema) -> "WarcLiteStreamReader":
        return WarcLiteStreamReader(self.options)


class WarcLiteStreamReader(SimpleDataSourceStreamReader):
    """Streaming ingestion of an arriving crawl directory (SRC5b): each
    micro-batch picks up the .warc segment files that appeared since the
    last committed offset — the custom-source analogue of the built-in
    file stream, but for a format Spark cannot read natively. Offsets
    are the sorted list of consumed file names (JSON-serializable, so
    checkpoint/restart replays deterministically via
    readBetweenOffsets); a segment file is assumed immutable once
    present, exactly like real crawl drops."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warclite: option 'path' is required")

    def _files(self) -> list[str]:
        return sorted(f for f in os.listdir(self.path)
                      if f.endswith(".warc"))

    def initialOffset(self) -> dict:
        return {"seen": []}

    def read(self, start: dict):
        files = self._files()
        new = [f for f in files if f not in set(start.get("seen", []))]
        rows = [rec for f in new
                for rec in _parse_file(os.path.join(self.path, f))]
        return iter(rows), {"seen": files}

    def readBetweenOffsets(self, start: dict, end: dict):
        replay = [f for f in end.get("seen", [])
                  if f not in set(start.get("seen", []))]
        return iter(rec for f in replay
                    for rec in _parse_file(os.path.join(self.path, f)))


