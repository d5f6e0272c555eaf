"""End-to-end KG-construction pipeline (BASELINE.json north_rule):
triple extraction → entity linking → canonicalization → graph materialize,
with IcebergLite tables, per-partition lineage, and checkpoint-resume.

Stage graph (tables under ``out_root``)::

    web_pages ─X1..X7─> extracted(∂lang) ─> mentions / triples_raw
                 links (exact ⊕ LSH) ─> cc labels ─> canonical triples
                 ─G1─> triples(∂pred)      + lineage(∂stage) throughout

Resume semantics (SURVEY.md §3.2.6): the extraction stage is
partition-resumable — input partitions already present in the
``extracted`` manifest are skipped via an anti-filter on partition values
(manifest-side, no data read). Downstream stages are recomputed iff any
upstream partition was (re)built or their output is missing; all writes are
dynamic-partition overwrites, so re-runs are idempotent.
"""

from __future__ import annotations



from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators import canonicalize as C
from ..operators import extract as X
from ..operators import linking as L
from ..operators.lineage import StageTimer, lineage_rows
from ..operators.webpages import web_pages
from ..sources import iceberglite as il


def _t(out_root: str, name: str) -> str:
    return f"{out_root}/{name}"


def run_pipeline(spark: SparkSession, sf_dir: str, out_root: str,
                 run_id: str = "r0", resume: bool = False,
                 skew: bool = False, lang: str = "en",
                 pages: "DataFrame | None" = None) -> dict:
    """Returns {'triples': DataFrame, 'recomputed_langs': [...], 'stats': {...}}.

    ``pages`` overrides the input web-page stream (columns url, warc_ts,
    lang, html) — e.g. a WARC-lite crawl directory read through the
    sources.warclite data source (jobs/run_pipeline.py --warc-dir).
    ``sf_dir`` still supplies the linking alias dictionary."""
    stats: dict[str, float] = {}
    t_ext = _t(out_root, "extracted")
    t_triples = _t(out_root, "triples")
    t_lineage = _t(out_root, "lineage")

    # ---- stage 1: extraction (partition-resumable on lang) ----------------
    wp = pages if pages is not None else web_pages(spark, sf_dir, skew=skew)
    done_langs: set[str] = set()
    if resume and il.exists(t_ext):
        done_langs = {p["lang"] for p in il.partitions(t_ext) if "lang" in p}
    todo = wp.filter(~F.col("lang").isin(*done_langs)) if done_langs else wp
    recomputed = []
    with StageTimer() as st:
        if not resume or not il.exists(t_ext) or not done_langs:
            ext_new = X.extract_text(todo)
            il.overwrite_partitions(ext_new, t_ext, ["lang"])
            recomputed = [p["lang"] for p in il.partitions(t_ext)]
        else:
            new_langs = [r.lang for r in todo.select("lang").distinct().collect()]
            if new_langs:
                ext_new = X.extract_text(todo)
                il.overwrite_partitions(ext_new, t_ext, ["lang"])
                recomputed = new_langs
    ext = il.read(spark, t_ext)
    il.append(
        lineage_rows(ext, run_id, "extract", F.col("lang"), st.wall_ms),
        t_lineage, ["stage"])
    stats["extract_ms"] = st.wall_ms

    if resume and not recomputed and il.exists(t_triples):
        return {"triples": il.read(spark, t_triples),
                "recomputed_langs": [], "stats": stats}

    # ---- stage 2: sentence split + joint inference ------------------------
    with StageTimer() as st:
        sents = X.split_sentences(X.lang_filter(ext, lang)).persist()
        infd = X.infer_distinct(sents)
        inferred = X.infer(sents, inferred_distinct=infd)
        triples_raw = X.triples_raw(inferred)
    stats["infer_ms"] = st.wall_ms

    # ---- stage 3: linking + canonicalization ------------------------------
    with StageTimer() as st:
        aliases = L.alias_dict(spark, sf_dir)
        # all dictionary-sized work (normalization, candidate generation,
        # CC) derives from the DISTINCT-sentence inference table; only the
        # triple stream is touched per row (broadcast joins in C4)
        raw_surfaces = X.mention_surfaces(infd)
        surfaces = (raw_surfaces
                    .select(L.normalize_col(F.col("surface")).alias("alias_norm"))
                    .distinct())
        resolution = L.resolve_surfaces(surfaces, aliases).persist()
        labels = C.connected_components(L.resolution_edges(resolution))
        canon_map = C.surface_canon_map(resolution, labels)
        canon = C.canonical_triples_by_surface(triples_raw, canon_map,
                                               raw_surfaces=raw_surfaces)
    stats["link_ms"] = st.wall_ms

    # ---- stage 4: graph materialize (G1 dedup-agg + G2 write) -------------
    with StageTimer() as st:
        ts_by_url = ext.select("url", "warc_ts")
        triples = (
            canon.join(ts_by_url, "url")
            .groupBy("subj", "pred", "obj")
            .agg(
                F.min("subj_norm").alias("subj_name"),
                F.min("obj_norm").alias("obj_name"),
                F.count("*").alias("evidence_count"),
                F.countDistinct("url").alias("n_sources"),
                F.min("warc_ts").alias("first_seen"),
                F.array_sort(F.collect_set("url")).alias("sources"),
            )
        )
        # pre-write layout: partition by pred (low cardinality), bucket-ish
        # spread on hash(subj) so hot predicates don't serialize one writer
        triples = triples.repartition(
            F.col("pred"), F.pmod(F.hash("subj"), F.lit(8)))
        il.overwrite_partitions(triples, t_triples, ["pred"])
    stats["materialize_ms"] = st.wall_ms

    out = il.read(spark, t_triples)
    il.append(
        lineage_rows(out, run_id, "materialize", F.col("pred"), st.wall_ms),
        t_lineage, ["stage"])
    sents.unpersist()
    resolution.unpersist()
    return {"triples": out, "recomputed_langs": recomputed, "stats": stats}
