"""T1 byte-identity + T2 partition/batch invariance + T3 triple P/R.

The Spark pipeline (Arrow UDF stages over arbitrary partitionings) must
reproduce the single-process oracle exactly — the oracle run IS the
reference (SURVEY.md §0.2). Gates: byte-identical text per url
(BASELINE.json input_hint) and triple P/R >= 0.95 (BASELINE.json metric).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from joint_entity_and_relation_extraction_spark.operators import extract as X
from joint_entity_and_relation_extraction_spark.operators.webpages import web_pages
from oracle import pipeline_local as oracle

from conftest import SF0001

GOLDENS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "goldens")


@pytest.fixture(scope="module")
def extracted(spark):
    return X.extract_text(web_pages(spark, SF0001, num_partitions=7)).cache()


def test_t1_byte_identity_vs_goldens(extracted):
    got = {r.url: (r.text_sha, r.n_chars) for r in
           extracted.select("url", "text_sha", "n_chars").collect()}
    with open(os.path.join(GOLDENS, "extraction.jsonl")) as f:
        want = {j["url"]: (j["text_sha"], j["n_chars"])
                for j in map(json.loads, f)}
    assert got == want  # byte-identical per url, every page incl. latin-1/malformed


def test_t1_text_bytes_equal_oracle(extracted):
    oracle_ext = oracle.extract_text(oracle.gen_web_pages(SF0001))
    want = dict(zip(oracle_ext.url, oracle_ext.text))
    got = {r.url: r.text for r in extracted.select("url", "text").collect()}
    assert got == want


def test_t2_t3_pipeline_parity_and_pr(spark, extracted):
    sents = X.split_sentences(X.lang_filter(extracted))
    inferred = X.infer(sents).cache()
    spark_triples = X.triples_raw(inferred)
    got = {(r.url, r.sent_id, r.subj_surface, r.subj_label, r.pred,
            r.obj_surface, r.obj_label) for r in spark_triples.collect()}
    with open(os.path.join(GOLDENS, "triples_sf0001.json")) as f:
        want = {tuple(t) for t in json.load(f)}
    tp = len(got & want)
    precision = tp / max(len(got), 1)
    recall = tp / max(len(want), 1)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    assert precision == 1.0 and recall == 1.0  # same code ⇒ exact

    # mentions parity too (NER head)
    om, ot = oracle.infer(oracle.split_sentences(
        oracle.extract_text(oracle.gen_web_pages(SF0001)).query("lang=='en'")))
    want_m = {(r.url, r.sent_id, r.m_id, r.start, r.end, r.label, r.surface)
              for r in om.itertuples(index=False)}
    got_m = {(r.url, r.sent_id, r.m_id, r.start, r.end, r.label, r.surface)
             for r in X.mentions(inferred).collect()}
    assert got_m == want_m


def test_t2_partitioning_and_batchsize_invariance(spark):
    """Different partition counts AND Arrow batch sizes ⇒ identical output
    (determinism across physical execution choices, SURVEY.md §7 risk 2)."""
    base = None
    for nparts, batch in [(2, 1024), (7, 64)]:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
        try:
            ext = X.extract_text(web_pages(spark, SF0001, num_partitions=nparts))
            sents = X.split_sentences(X.lang_filter(ext)).limit(0).union(
                X.split_sentences(X.lang_filter(ext)))  # stable plan
            trip = X.triples_raw(X.infer(sents))
            got = {tuple(r) for r in trip.collect()}
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        if base is None:
            base = got
        else:
            assert got == base


def test_infer_dedup_equals_full_inference(spark):
    """The bench's scaling config (dedup=False) and the production config
    (dedup=True) must produce IDENTICAL rows — the model is deterministic
    per sentence, so inferring each distinct token sequence once and
    joining back is an equivalence, not an approximation."""
    import json

    from joint_entity_and_relation_extraction_spark.operators.webpages import (
        web_pages)

    wp = web_pages(spark, SF0001, replicate=2)
    sents = X.split_sentences(X.lang_filter(X.extract_text(wp)))

    def key(df):
        return {
            (r.url, r.sent_id): (
                json.dumps([m.asDict() for m in r.mentions]),
                json.dumps([x.asDict() for x in r.relations]))
            for r in df.collect()
        }

    a = key(X.infer(sents, dedup=True))
    b = key(X.infer(sents, dedup=False))
    assert len(a) == len(b) > 0
    assert a == b
