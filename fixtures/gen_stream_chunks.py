"""Streaming fixture: chronological parquet chunk drops of web_pages
(FIXTURES.md §6). Deterministic from doc_id: 5%ish of rows are late
arrivals (old warc_ts delivered 3 chunks later), 3%ish re-crawl an earlier
url 5 minutes later (stateful-dedup cases)."""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle import pipeline_local as oracle  # noqa: E402

N_CHUNKS = 10


def gen_chunks(sf_dir: str, out_dir: str, late: bool = True) -> dict:
    """Returns {'n_rows', 'n_late', 'n_dups', 'late_urls'}."""
    pages = oracle.gen_web_pages(sf_dir).sort_values("warc_ts").reset_index(drop=True)
    pages["doc_id"] = pages["url"].str.rsplit("/", n=1).str[1].astype(int)
    n = len(pages)
    per = (n + N_CHUNKS - 1) // N_CHUNKS
    chunk_of = {}
    for i in range(n):
        chunk_of[i] = i // per
    late_urls, dup_rows = [], []
    if late:
        for i in range(n):
            r = pages.iloc[i]
            if r.doc_id % 20 == 7 and chunk_of[i] < N_CHUNKS - 5:
                # old timestamp delivered ~2.5h later: clearly beyond the
                # 1h watermark (+10min window rounding slack)
                chunk_of[i] += 5
                late_urls.append(r.url)
            if r.doc_id % 33 == 0 and chunk_of[i] < N_CHUNKS - 1:
                dup = r.copy()
                dup["warc_ts"] = r["warc_ts"] + __import__("datetime").timedelta(minutes=5)
                dup_rows.append((chunk_of[i] + 1, dup))
    os.makedirs(out_dir, exist_ok=True)
    schema = pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string()),
    ])
    cols = ["url", "warc_ts", "html", "text", "lang"]
    for c in range(N_CHUNKS):
        rows = [pages.iloc[i] for i in range(n) if chunk_of[i] == c]
        rows += [d for (ci, d) in dup_rows if ci == c]
        tbl = pa.Table.from_pylist(
            [{k: r[k] for k in cols} for r in rows], schema=schema)
        pq.write_table(tbl, os.path.join(out_dir, f"chunk_{c:02d}.parquet"))
    return {"n_rows": n, "n_late": len(late_urls), "n_dups": len(dup_rows),
            "late_urls": late_urls}


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="fixtures/out/stream_chunks")
    ap.add_argument("--no-late", action="store_true")
    a = ap.parse_args()
    print(gen_chunks(a.sf_dir, a.out, late=not a.no_late))
