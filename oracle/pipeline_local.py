"""Single-process grading oracle (SURVEY.md §5.2 T2/T3, §5.3).

Pure pandas/numpy/stdlib — no Spark. Imports the SAME deterministic kernels
(functions/text.py, functions/model.py, functions/webgen.py) that the Spark
operators wrap, so its output defines the reference: the Spark pipeline must
reproduce it exactly under any partitioning / Arrow batch size, and the
committed goldens (goldens/extraction.jsonl, goldens/triples_*.json) are
generated ONCE from here (regeneration is a reviewed event, SURVEY.md §5.3).

Run:  python -m oracle.pipeline_local --sf-dir /root/testdata/sf0.001 --write-goldens
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import joint_entity_and_relation_extraction_spark  # noqa: F401,E402  (sets BLAS env before numpy loads)
import pandas as pd  # noqa: E402

from joint_entity_and_relation_extraction_spark.functions import (  # noqa: E402
    model as M,
    text as T,
    webgen,
)

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "goldens")


def gen_web_pages(sf_dir: str, skew: bool = False) -> pd.DataFrame:
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    rows = [webgen.web_page_row(r.doc_id, r.text, r.lang, r.source, skew=skew)
            for r in docs.itertuples(index=False)]
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def extract_text(pages: pd.DataFrame) -> pd.DataFrame:
    out = pages.copy()
    out["text"] = out["html"].map(T.html_to_text)
    out["text_sha"] = out["text"].map(
        lambda t: hashlib.sha256(t.encode("utf-8")).hexdigest())
    out["n_chars"] = out["text"].str.len()
    return out[["url", "warc_ts", "lang", "text", "text_sha", "n_chars"]]


def split_sentences(extracted: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for r in extracted.itertuples(index=False):
        for s in T.sentences(r.text):
            rows.append((r.url, s["sent_id"], s["char_start"], s["char_end"],
                         s["tokens"]))
    return pd.DataFrame(rows, columns=["url", "sent_id", "char_start",
                                       "char_end", "tokens"])


def infer(sentences: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame]:
    """→ (mentions, triples_raw) with the same columns as the Spark stages."""
    ment_rows, rel_rows = [], []
    for r in sentences.itertuples(index=False):
        toks = list(r.tokens)
        spans, pairs = M.extract_sentence(toks)
        for m_id, (s, e, lab, sc) in enumerate(spans):
            ment_rows.append((r.url, r.sent_id, m_id, s, e, lab,
                              " ".join(toks[s:e]), sc))
        for h, t, pred, sc in pairs:
            hs, he = spans[h][0], spans[h][1]
            ts_, te = spans[t][0], spans[t][1]
            rel_rows.append((r.url, r.sent_id, h, t,
                             " ".join(toks[hs:he]), spans[h][2], pred,
                             " ".join(toks[ts_:te]), spans[t][2], sc))
    mentions = pd.DataFrame(ment_rows, columns=[
        "url", "sent_id", "m_id", "start", "end", "label", "surface", "score"])
    triples = pd.DataFrame(rel_rows, columns=[
        "url", "sent_id", "subj_m", "obj_m", "subj_surface", "subj_label",
        "pred", "obj_surface", "obj_label", "score"])
    return mentions, triples


def run(sf_dir: str, lang: str = "en") -> dict[str, pd.DataFrame]:
    pages = gen_web_pages(sf_dir)
    extracted = extract_text(pages)
    filtered = extracted[extracted["lang"] == lang]
    sents = split_sentences(filtered)
    mentions, triples = infer(sents)
    return {"web_pages": pages, "extracted": extracted, "sentences": sents,
            "mentions": mentions, "triples_raw": triples}


def triple_keys(triples: pd.DataFrame) -> set[tuple]:
    """Strict-match triple identity (SURVEY.md §5.1): evidence location +
    surfaces + predicate."""
    return {
        (r.url, int(r.sent_id), r.subj_surface, r.subj_label, r.pred,
         r.obj_surface, r.obj_label)
        for r in triples.itertuples(index=False)
    }


def write_goldens(sf_dir: str) -> None:
    res = run(sf_dir)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    ext = res["extracted"].sort_values("url")
    with open(os.path.join(GOLDEN_DIR, "extraction.jsonl"), "w") as f:
        for r in ext.itertuples(index=False):
            f.write(json.dumps({"url": r.url, "text_sha": r.text_sha,
                                "n_chars": int(r.n_chars)}) + "\n")
    keys = sorted(triple_keys(res["triples_raw"]))
    with open(os.path.join(GOLDEN_DIR, "triples_sf0001.json"), "w") as f:
        json.dump([list(k) for k in keys], f, indent=0)
    print(f"goldens: {len(ext)} pages, {len(keys)} triples -> {GOLDEN_DIR}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--write-goldens", action="store_true")
    a = ap.parse_args()
    if a.write_goldens:
        write_goldens(a.sf_dir)
    else:
        res = run(a.sf_dir)
        for k, v in res.items():
            print(k, len(v))
