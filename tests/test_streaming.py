"""T7: Structured Streaming ingest — windowed aggregation parity vs batch,
late-data drop, stateful re-crawl dedup, exactly-once foreachBatch sink."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures"))

from gen_stream_chunks import gen_chunks  # noqa: E402

from joint_entity_and_relation_extraction_spark.sources import iceberglite as il
from joint_entity_and_relation_extraction_spark.streaming import ingest as S

from conftest import SF0001


@pytest.fixture(scope="module")
def clean_chunks(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("chunks_clean"))
    info = gen_chunks(SF0001, d, late=False)
    return d, info


@pytest.fixture(scope="module")
def late_chunks(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("chunks_late"))
    info = gen_chunks(SF0001, d, late=True)
    return d, info


def _run_to_memory(spark, df, name, output_mode="append"):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(name)


def test_windowed_counts_match_batch_when_no_late_data(spark, clean_chunks):
    d, info = clean_chunks
    stream = S.read_page_stream(spark, d)
    got = _run_to_memory(
        spark, S.windowed_lang_counts(stream), "win_clean").groupBy(
        "w_start", "lang").agg(F.sum("n_pages").alias("n_pages"))
    batch = spark.read.parquet(d)
    want = (batch.groupBy(F.window("warc_ts", "10 minutes").alias("w"), "lang")
            .agg(F.count("*").alias("n_pages"))
            .select(F.col("w.start").alias("w_start"), "lang", "n_pages"))
    g = {(r.w_start, r.lang, r.n_pages) for r in got.collect()}
    w = {(r.w_start, r.lang, r.n_pages) for r in want.collect()}
    # append-mode emits only watermark-closed windows; every emitted window
    # must match batch exactly, and every window that closed before the
    # final watermark (max event time - 1h) must have been emitted
    assert g <= w
    import datetime

    max_ts = batch.agg(F.max("warc_ts")).collect()[0][0]
    wm = max_ts - datetime.timedelta(hours=1)
    closed = {(ws, lg, n) for (ws, lg, n) in w
              if ws + datetime.timedelta(minutes=10) <= wm}
    assert closed <= g and len(closed) > 50


def test_late_rows_are_dropped_and_metered(spark, late_chunks):
    d, info = late_chunks
    assert info["n_late"] > 0
    listener = S.MicroBatchMetricsListener().attach(spark)
    try:
        stream = S.read_page_stream(spark, d)
        got = _run_to_memory(spark, S.windowed_lang_counts(stream), "win_late")
        total_windowed = got.agg(F.sum("n_pages")).collect()[0][0] or 0
        n_input = info["n_rows"] + info["n_dups"]
        # late rows (delivered 3 chunks = ~hours of event time later) fall
        # behind the 1h watermark and are dropped from closed windows
        assert total_windowed < n_input
        # listener captured per-micro-batch lineage incl. the drops
        import time

        for _ in range(20):  # listener events are async
            if sum(r["dropped_late_rows"] for r in listener.rows) > 0:
                break
            time.sleep(0.5)
        assert sum(r["input_rows"] for r in listener.rows) >= n_input
        assert sum(r["dropped_late_rows"] for r in listener.rows) > 0
    finally:
        listener.detach(spark)


def test_session_windows_and_enrich_run(spark, clean_chunks):
    d, _ = clean_chunks
    stream = S.read_page_stream(spark, d, max_files_per_trigger=5)
    sess = _run_to_memory(spark, S.session_windows(stream), "sess")
    assert sess.count() >= 0
    dim = spark.createDataFrame(
        [("en", "west"), ("fr", "west"), ("zh", "east")], "lang string, region string")
    enr = _run_to_memory(
        spark, S.stream_static_enrich(S.read_page_stream(spark, d, 10), dim)
        .select("url", "lang", "region"), "enr")
    assert enr.filter(F.col("region").isNotNull()).count() > 0


def test_recrawl_dedup(spark, late_chunks):
    d, info = late_chunks
    assert info["n_dups"] > 0
    stream = S.read_page_stream(spark, d, max_files_per_trigger=3)
    got = _run_to_memory(spark, S.dedup_recrawls(stream), "dedup")
    n = got.count()
    n_distinct = got.select("url").distinct().count()
    assert n == n_distinct  # every re-crawl within the watermark suppressed
    assert n <= info["n_rows"]


def test_foreachbatch_sink_exactly_once(spark, clean_chunks, tmp_path):
    d, info = clean_chunks
    table = str(tmp_path / "ext_table")
    ckpt = str(tmp_path / "ckpt")
    q = S.extract_to_iceberg(S.read_page_stream(spark, d, 4), table, ckpt).start()
    q.awaitTermination(180)
    out = il.read(spark, table)
    assert out.count() == info["n_rows"]
    assert out.select("text_sha").distinct().count() > 1
    snaps_before = len(il.snapshots(table))
    # restart with same checkpoint and no new files: no duplicate batches
    q2 = S.extract_to_iceberg(S.read_page_stream(spark, d, 4), table, ckpt).start()
    q2.awaitTermination(120)
    assert len(il.snapshots(table)) == snaps_before
    assert il.read(spark, table).count() == info["n_rows"]


def test_stateful_sessions_close_on_watermark(spark, clean_chunks):
    """applyInPandasWithState custom operator: with a 10-minute gap over
    the ~12.3-minute-spaced fixture, every page is its own session; a
    session must emit closed=true iff the event-time watermark passed its
    end + gap while batches were still arriving."""
    import datetime

    d, info = clean_chunks
    stream = S.read_page_stream(spark, d)
    got = _run_to_memory(
        spark, S.stateful_domain_sessions(stream, gap="10 minutes",
                                          watermark="20 minutes"),
        "state_sessions", output_mode="update")
    closed = {(r.domain, r.s_start) for r in
              got.filter("closed").collect()}
    batch = spark.read.parquet(d).withColumn(
        "domain", F.regexp_extract("url", r"https://([^/]+)/", 1))
    rows = [(r.domain, r.warc_ts) for r in
            batch.select("domain", "warc_ts").collect()]
    all_pages = set(rows)
    last_per_domain = {}
    for dom, ts in rows:
        last_per_domain[dom] = max(last_per_domain.get(dom, ts), ts)
    last_pages = {(d_, t_) for d_, t_ in last_per_domain.items()}
    # gap-split guarantees every non-final page closes its own session
    # (successor arrives > gap later); the final page per domain closes
    # only if the event-time timeout fired before the stream drained
    assert all_pages - last_pages <= closed <= all_pages
    # every closed singleton session carries exact aggregates
    for r in got.filter("closed").collect():
        assert r.n_pages == 1 and r.n_langs == 1 and r.s_start == r.s_end


def test_stateful_sessions_merge_state_across_batches(spark, clean_chunks):
    """With the gap above the fixture's inter-arrival spacing, each
    domain's session never closes; the per-batch snapshots must show the
    state ACCUMULATING across micro-batches (one file per trigger) up to
    the domain's full page count."""
    d, info = clean_chunks
    stream = S.read_page_stream(spark, d, max_files_per_trigger=1)
    got = _run_to_memory(
        spark, S.stateful_domain_sessions(stream, gap="30 minutes",
                                          watermark="20 minutes"),
        "state_sessions_merge", output_mode="update")
    assert got.filter("closed").count() == 0
    batch = spark.read.parquet(d).withColumn(
        "domain", F.regexp_extract("url", r"https://([^/]+)/", 1))
    want = {r.domain: r.n for r in
            batch.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    final = {r.domain: r.n_pages for r in
             got.groupBy("domain").agg(
                 F.max("n_pages").alias("n_pages")).collect()}
    assert final == want
    # snapshots grew monotonically: more than one distinct snapshot size
    # per domain proves cross-batch state merge (not one-shot aggregation)
    sizes = got.groupBy("domain").agg(
        F.countDistinct("n_pages").alias("k")).collect()
    assert all(r.k > 1 for r in sizes)


def test_tws_builds_query_plan(spark, clean_chunks):
    """Even without protobuf (which execution needs), the
    transformWithStateInPandas query must ANALYZE: grouping, processor
    wiring, and output schema are checked at plan time."""
    d, _ = clean_chunks
    df = S.tws_domain_stats(S.read_page_stream(spark, d))
    assert df.isStreaming
    assert df.columns == ["domain", "n_pages", "n_langs"]


def test_tws_domain_stats_accumulates_across_batches(spark, clean_chunks):
    """transformWithStateInPandas (Spark 4 stateful API): the per-domain
    running totals must accumulate across micro-batches (one file per
    trigger) and converge to the exact batch aggregates. Needs
    google.protobuf (TWS driver-worker protocol), absent from this
    sandbox — runs wherever it exists."""
    pytest.importorskip("google.protobuf")
    d, info = clean_chunks
    stream = S.read_page_stream(spark, d, max_files_per_trigger=1)
    got = _run_to_memory(spark, S.tws_domain_stats(stream),
                         "tws_stats", output_mode="update")
    batch = spark.read.parquet(d).withColumn(
        "domain", F.regexp_extract("url", r"https://([^/]+)/", 1))
    want = {(r.domain, r.n, r.nl) for r in
            batch.groupBy("domain").agg(
                F.count("*").alias("n"),
                F.countDistinct("lang").alias("nl")).collect()}
    final = {(r.domain, r.n_pages, r.n_langs) for r in
             got.groupBy("domain").agg(
                 F.max("n_pages").alias("n_pages"),
                 F.max("n_langs").alias("n_langs")).collect()}
    assert final == want
    # snapshots grew across batches: cross-batch state, not one-shot agg
    sizes = got.groupBy("domain").agg(
        F.countDistinct("n_pages").alias("k")).collect()
    assert all(r.k > 1 for r in sizes)


def test_streaming_incremental_dedup_converges_to_batch(spark, tmp_path):
    """Continuous incremental dedup (foreachBatch band-index probe +
    append): after streaming chunk files one per trigger — with near-dup
    copies injected ACROSS chunks, so pairs can only be found by probing
    the persisted index — the pairs table must equal the batch
    minhash-LSH pair set over the whole corpus, the index must have
    grown across multiple snapshots, and replaying a batch by hand must
    change nothing (crash-replay idempotency)."""
    import datetime
    import os

    import pandas as pd

    from joint_entity_and_relation_extraction_spark.operators import dedup as DD
    from joint_entity_and_relation_extraction_spark.operators.dedup import (
        band_index)
    from joint_entity_and_relation_extraction_spark.sources import (
        iceberglite as il)

    docs = pd.read_parquet(os.path.join(SF0001, "documents.parquet"))
    ts = datetime.datetime(2024, 1, 1)

    def rows(frame, tag):
        return pd.DataFrame({
            "url": [f"https://{tag}-{i}.test/p" for i in frame.index],
            "warc_ts": [ts] * len(frame),
            "html": [t.encode() for t in frame.text],
            "text": list(frame.text),
            "lang": list(frame.lang),
        })

    def neardup(frame, tag):
        """Copies whose first word is edited — high Jaccard, new urls."""
        out = rows(frame, tag)
        out["text"] = ["edited" + t[t.index(" "):] for t in out.text]
        out["html"] = [t.encode() for t in out.text]
        return out

    d = str(tmp_path / "chunks")
    os.makedirs(d)
    c0 = rows(docs.iloc[0:80], "c0")
    # chunk1 carries near-dups of chunk0 docs (cross-batch: only the
    # index probe can find them) plus fresh docs
    c1 = pd.concat([rows(docs.iloc[80:160], "c1"),
                    neardup(docs.iloc[0:6], "c1dup")])
    # chunk2: near-dups of chunk1 docs + a within-chunk dup pair
    c2 = pd.concat([rows(docs.iloc[160:240], "c2"),
                    neardup(docs.iloc[80:86], "c2dup"),
                    neardup(docs.iloc[200:203], "c2self")])
    for i, c in enumerate((c0, c1, c2)):
        c.to_parquet(os.path.join(d, f"{i:02d}.parquet"),
                     coerce_timestamps="us")

    roots = {k: str(tmp_path / k)
             for k in ("index", "docs", "pairs", "labels")}
    stream = S.read_page_stream(spark, d, max_files_per_trigger=1)
    q = S.dedup_stream(stream, roots["index"], roots["docs"],
                       roots["pairs"], str(tmp_path / "ckpt"),
                       labels_root=roots["labels"]).start()
    q.awaitTermination(180)

    batch = (spark.read.parquet(d)
             .select(F.xxhash64("url").alias("doc_id"), "text")
             .dropDuplicates(["doc_id"]))
    # batch reference: same band join + verify over the full corpus
    bands = band_index(batch).localCheckpoint(eager=False)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("d1"),
                    F.col("b.doc_id").alias("d2"))
            .dropDuplicates(["d1", "d2"]))
    sh = batch.select("doc_id", DD._shingles_expr(2).alias("sh"))
    s1 = sh.select(F.col("doc_id").alias("d1"), F.col("sh").alias("sh1"))
    s2 = sh.select(F.col("doc_id").alias("d2"), F.col("sh").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2")).cast("double")
    union = (F.size("sh1") + F.size("sh2")).cast("double") - inter
    want = {(r.d1, r.d2, r.jaccard) for r in
            (cand.join(s1, "d1").join(s2, "d2")
             .withColumn("jaccard", F.round(inter / union, 6))
             .filter(F.col("jaccard") >= 0.2)
             .select("d1", "d2", "jaccard")).collect()}
    assert len(want) >= 10  # the injected near-dups are actually found

    got_df = il.read(spark, roots["pairs"]).select("d1", "d2", "jaccard")
    got = {(r.d1, r.d2, r.jaccard) for r in got_df.collect()}
    assert got == want
    assert got_df.count() == len(got)  # each pair appended exactly once
    # incremental evidence: the index grew snapshot by snapshot
    assert len(il.snapshots(roots["index"])) == 3
    assert il.read(spark, roots["index"]).select("doc_id").distinct().count() \
        == batch.count()
    # crash-replay: rerun the last chunk by hand with its batch_id — tags
    # skip the appends, values converge, nothing double-counts
    # continuous cluster maintenance: per-batch label folds must equal
    # one from-scratch CC over the full emitted pair set
    from joint_entity_and_relation_extraction_spark.operators.canonicalize import (
        connected_components)

    edge_df = spark.createDataFrame(
        [(d1, d2) for (d1, d2, _) in want], "src long, dst long")
    want_labels = {(r.node, r.component)
                   for r in connected_components(edge_df).collect()}
    got_labels = {(r.doc_id, r.cluster_id)
                  for r in il.read(spark, roots["labels"])
                  .select("doc_id", "cluster_id").collect()}
    assert got_labels == want_labels
    n_label_snaps = len(il.snapshots(roots["labels"]))
    last_tag = sorted(il.committed_tags(roots["pairs"]))[-1]
    last_id = int(last_tag.rsplit("-", 1)[-1])
    replay = spark.read.parquet(os.path.join(d, "02.parquet"))
    S.dedup_index_handler(roots["index"], roots["docs"], roots["pairs"],
                          labels_root=roots["labels"])(replay, last_id)
    assert il.read(spark, roots["pairs"]).count() == len(got)
    assert len(il.snapshots(roots["index"])) == 3
    # label fold is value-idempotent: replay changed nothing, so the
    # empty-changed-set guard skipped the merge entirely
    assert len(il.snapshots(roots["labels"])) == n_label_snaps
    got_labels2 = {(r.doc_id, r.cluster_id)
                   for r in il.read(spark, roots["labels"])
                   .select("doc_id", "cluster_id").collect()}
    assert got_labels2 == want_labels


def test_redelivered_url_is_noop(spark, tmp_path):
    """At-least-once sources re-deliver: a url seen in an EARLIER batch
    must not re-append its doc/bands or re-emit its pairs when it shows
    up again under a NEW batch_id (ADVICE r04 — the tag guard only
    covers same-batch replays)."""
    import datetime
    import os

    import pandas as pd

    from joint_entity_and_relation_extraction_spark.sources import (
        iceberglite as il)

    docs = pd.read_parquet(os.path.join(SF0001, "documents.parquet"))
    ts = datetime.datetime(2024, 1, 1)
    chunk = pd.DataFrame({
        "url": [f"https://redeliver-{i}.test/p" for i in range(40)],
        "warc_ts": [ts] * 40,
        "html": [t.encode() for t in docs.text[:40]],
        "text": list(docs.text[:40]),
        "lang": list(docs.lang[:40]),
    })
    roots = {k: str(tmp_path / k) for k in ("index", "docs", "pairs")}
    handler = S.dedup_index_handler(roots["index"], roots["docs"],
                                    roots["pairs"])
    handler(spark.createDataFrame(chunk), 0)
    n_docs = il.read(spark, roots["docs"]).count()
    n_bands = il.read(spark, roots["index"]).count()
    snaps = len(il.snapshots(roots["index"]))
    # the same urls arrive again in a LATER batch (new batch_id)
    handler(spark.createDataFrame(chunk), 1)
    assert il.read(spark, roots["docs"]).count() == n_docs
    assert il.read(spark, roots["index"]).count() == n_bands
    assert len(il.snapshots(roots["index"])) == snaps
    # a mixed batch (20 re-delivered + 20 genuinely new) ingests ONLY
    # the new half
    mixed = chunk.copy()
    mixed.loc[20:, "url"] = [f"https://fresh-{i}.test/p"
                             for i in range(20)]
    handler(spark.createDataFrame(mixed), 2)
    assert il.read(spark, roots["docs"]).count() == n_docs + 20


def test_stream_stream_interval_join_matches_batch(spark, late_chunks):
    """STREAM-STREAM watermarked interval join (crawl x recrawl of the
    same url within 1h). With availableNow over the chunk drops, every
    on-time pair must appear; pairs whose crawl side was delivered
    ~2.5h late (beyond the 2h watermark) MAY be dropped by state
    eviction — so: batch-minus-late <= streamed <= batch."""
    d, info = late_chunks
    a = S.read_page_stream(spark, d)
    b = S.read_page_stream(spark, d)
    got = _run_to_memory(spark, S.recrawl_interval_join(a, b), "ssjoin")
    got_set = {(r.url, r.a_ts, r.b_ts) for r in got.collect()}
    batch = spark.read.parquet(d)
    # same operator, batch DataFrames: withWatermark is a no-op in batch,
    # so this is the exact-join reference
    want_all = {(r.url, r.a_ts, r.b_ts)
                for r in S.recrawl_interval_join(batch, batch).collect()}
    late = set(info["late_urls"])
    want_ontime = {t for t in want_all if t[0] not in late}
    assert want_ontime, "fixture should contain on-time recrawl pairs"
    assert want_ontime <= got_set <= want_all


def test_crash_replay_still_folds_labels(spark, tmp_path):
    """ADVICE r05: a crash AFTER the docs append but BEFORE the label
    fold replays with every batch doc already ingested — the
    re-delivery anti-join early return must then fold the batch's
    PERSISTED pairs instead of skipping the cluster merges forever."""
    from joint_entity_and_relation_extraction_spark.sources import (
        iceberglite as il)

    base = "the quick brown fox jumps over the lazy dog again and again"
    batch = spark.createDataFrame(
        [(f"https://fold-{i}.test/p", base)
         for i in range(4)], "url string, text string")
    roots = {k: str(tmp_path / k)
             for k in ("index", "docs", "pairs", "labels")}
    handler = S.dedup_index_handler(roots["index"], roots["docs"],
                                    roots["pairs"],
                                    labels_root=roots["labels"])

    real_fold = S._fold_labels
    calls = []

    def crashing_fold(spark_, pairs, labels_root):
        calls.append(1)
        raise RuntimeError("simulated crash before label fold")

    S._fold_labels = crashing_fold
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            handler(batch, 0)
    finally:
        S._fold_labels = real_fold
    assert calls, "fixture must actually reach the fold step"
    # docs/pairs committed, labels never folded — the divergent state
    assert il.exists(roots["pairs"]) and not il.exists(roots["labels"])
    n_pairs = il.read(spark, roots["pairs"]).count()
    assert n_pairs > 0, "fixture must produce near-dup pairs"
    # checkpoint replay: same batch_df, same batch_id
    handler(batch, 0)
    assert il.exists(roots["labels"]), "replay must fold the labels"
    labels = il.read(spark, roots["labels"])
    # the 4 near-identical docs form one cluster
    assert labels.count() == 4
    assert labels.select("cluster_id").distinct().count() == 1
    # and a SECOND replay of the same batch changes nothing (idempotent)
    snaps = len(il.snapshots(roots["labels"]))
    handler(batch, 0)
    assert len(il.snapshots(roots["labels"])) == snaps
