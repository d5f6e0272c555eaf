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
    all_toks = [list(r.tokens) for r in sentences.itertuples(index=False)]
    extracted = M.extract_batch(all_toks)
    for r, toks, (spans, pairs) in zip(
            sentences.itertuples(index=False), all_toks, extracted):
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


# --- linking / canonicalization / materialize mirror ------------------------

from joint_entity_and_relation_extraction_spark.functions import (  # noqa: E402
    aliasgen as AG,
)


def build_aliases(sf_dir: str) -> list[dict]:
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    counts = AG.token_counts_from_texts(docs["text"])
    return AG.build_alias_rows(counts)


def link(mentions: pd.DataFrame, alias_rows: list[dict]) -> pd.DataFrame:
    """Mirror of operators/linking.link_mentions: exact broadcast pass,
    then LSH-banded fuzzy pass over distinct unlinked surfaces, top-1 by
    (sim, prior, entity_id)."""
    alias_map: dict[str, list[tuple[int, float]]] = {}
    for r in alias_rows:
        alias_map.setdefault(r["alias_norm"], []).append(
            (r["entity_id"], r["prior"]))

    bands: dict[int, list[str]] = {}
    for a in alias_map:
        for k in AG.band_keys(a):
            bands.setdefault(k, []).append(a)

    out = []
    fuzzy_cache: dict[str, tuple | None] = {}
    for r in mentions.itertuples(index=False):
        norm = T.normalize_surface(r.surface)
        if norm in alias_map:
            eid, prior = max(alias_map[norm], key=lambda ep: (ep[1], -ep[0]))
            out.append((r.url, r.sent_id, r.m_id, norm, eid, "exact", 1.0, prior, eid))
            continue
        if norm not in fuzzy_cache:
            cands = set()
            for k in AG.band_keys(norm):
                cands.update(bands.get(k, ()))
            msh = AG.char_shingles(norm)
            best = None
            for a in cands:
                sim = AG.round6(AG.jaccard(msh, AG.char_shingles(a)))
                if sim < 0.5:
                    continue
                for eid, prior in alias_map[a]:
                    key = (-sim, -prior, eid)
                    if best is None or key < best[0]:
                        best = (key, a, eid, prior, sim)
            fuzzy_cache[norm] = best
        best = fuzzy_cache[norm]
        if best is not None:
            _, a, eid, prior, sim = best
            out.append((r.url, r.sent_id, r.m_id, norm, eid, "lsh", sim, prior, eid))
        else:
            out.append((r.url, r.sent_id, r.m_id, norm, None, "none", None,
                        None, AG.surface_node_id(norm)))
    # dtype=object: a float64 column would silently round 63-bit entity ids
    return pd.DataFrame(out, columns=[
        "url", "sent_id", "m_id", "alias_norm", "entity_id", "method",
        "sim", "prior", "node_id"], dtype=object)


def connected_components(edges: set[tuple[int, int]]) -> dict[int, int]:
    """Union-find; component label = min node id (matches the Spark
    min-propagation)."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def canonicalize(links: pd.DataFrame, triples: pd.DataFrame) -> pd.DataFrame:
    edges = {
        (AG.surface_node_id(r.alias_norm), int(r.entity_id))
        for r in links.itertuples(index=False) if r.entity_id is not None
        and not pd.isna(r.entity_id)
    }
    labels = connected_components(edges)
    node = {(r.url, r.sent_id, r.m_id): (int(r.node_id), r.alias_norm)
            for r in links.itertuples(index=False)}
    rows = []
    for t in triples.itertuples(index=False):
        sn, snorm = node[(t.url, t.sent_id, t.subj_m)]
        on, onorm = node[(t.url, t.sent_id, t.obj_m)]
        if snorm == "" or onorm == "":
            continue  # punctuation-only mentions are not entities
        rows.append((t.url, t.sent_id, labels.get(sn, sn), snorm, t.pred,
                     labels.get(on, on), onorm, t.score))
    return pd.DataFrame(rows, columns=[
        "url", "sent_id", "subj", "subj_norm", "pred", "obj", "obj_norm",
        "score"])


def materialize(canon: pd.DataFrame) -> pd.DataFrame:
    g = (canon.groupby(["subj", "pred", "obj"], as_index=False)
         .agg(subj_name=("subj_norm", "min"), obj_name=("obj_norm", "min"),
              evidence_count=("url", "size"), n_sources=("url", "nunique")))
    return g


def run_full(sf_dir: str, lang: str = "en") -> dict[str, pd.DataFrame]:
    res = run(sf_dir, lang)
    links = link(res["mentions"], build_aliases(sf_dir))
    canon = canonicalize(links, res["triples_raw"])
    res["links"] = links
    res["canonical"] = canon
    res["triples"] = materialize(canon)
    return res


def triple_keys(triples: pd.DataFrame) -> set[tuple]:
    """Strict-match triple identity (SURVEY.md §5.1): evidence location +
    surfaces + predicate."""
    return {
        (r.url, int(r.sent_id), r.subj_surface, r.subj_label, r.pred,
         r.obj_surface, r.obj_label)
        for r in triples.itertuples(index=False)
    }


def sf_tag(sf_dir: str) -> str:
    """'/root/testdata/sf0.01' -> 'sf001' — the golden-file suffix."""
    return os.path.basename(sf_dir.rstrip(os.sep)).replace(".", "")


def write_goldens(sf_dir: str) -> None:
    res = run(sf_dir)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    tag = sf_tag(sf_dir)
    if tag == "sf0001":
        # the byte-identity extraction golden is pinned at the smallest
        # fixture only (SURVEY.md §5.3); triple goldens exist per sf so
        # kg_triple_metrics can grade at the driver's sf0.01 too
        ext = res["extracted"].sort_values("url")
        with open(os.path.join(GOLDEN_DIR, "extraction.jsonl"), "w") as f:
            for r in ext.itertuples(index=False):
                f.write(json.dumps({"url": r.url, "text_sha": r.text_sha,
                                    "n_chars": int(r.n_chars)}) + "\n")
    keys = sorted(triple_keys(res["triples_raw"]))
    with open(os.path.join(GOLDEN_DIR, f"triples_{tag}.json"), "w") as f:
        json.dump([list(k) for k in keys], f, indent=0)
    print(f"goldens: {len(res['extracted'])} pages, {len(keys)} triples "
          f"-> {GOLDEN_DIR}/triples_{tag}.json")


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
