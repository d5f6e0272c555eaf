"""Write BENCH/PLANS.md: `.explain("formatted")` for the headline
queries — the plan-quality evidence artifact (pushed filters, pruned
schemas, join strategies, WholeStageCodegen spans, no stray exchanges).

Run from the repo root: ``python jobs/dump_plans.py [sf_dir]``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from joint_entity_and_relation_extraction_spark.plans import registry
from joint_entity_and_relation_extraction_spark.session import build_session

SHOW = [
    "filter_pushdown",        # PushedFilters + ReadSchema pruning
    "join_broadcast",         # BroadcastHashJoin on the dim side
    "join_sortmerge",         # big-big SortMergeJoin
    "join_range_bucketed",    # interval join as hash equi-join (no NL)
    "agg_salted_skew",        # two-phase salted aggregation
    "dedup_minhash_lsh",      # banded self-join, checkpointed keys
    "dedup_winnow_pairs",     # fingerprint equi-join, DF-capped, partial agg
    "curation_select",        # two windows over ONE source exchange
    "pack_sequences",         # per-shard prefix-sum packing, one exchange
    "text_winnow_fingerprint",  # one exchange + one sort for two windows
    "stream_session_batch",   # session_window aggregation
    # r05 second batch
    "text_repetition",        # per-word tally partial agg + array-side grams
    "text_ngram_topk",        # partial agg + TakeOrderedAndProject (no sort)
    "stream_interval_join_batch",  # event-time interval join shape
    "graph_degrees",          # symmetrized edges, map-side-combinable agg
    "curation_score_normalize",    # grouped moments broadcast back, no window
    # r06
    "graph_degrees_lsh",      # banded-LSH edge base: equi-join, no NL
    "kg_triple_metrics",      # strict-key full-outer vs goldens, one agg
    "dedup_substring_spans",  # gram-DF partial agg + semi-join
    # r07
    "text_bigram_logprob",    # in-row zip_with bigrams, LM equi-joins
    "dedup_edit_verify",      # candidate equi-join + JVM levenshtein verify
    "curation_domain_cap",    # map-side URL parse, one-exchange top-k window
    "text_bm25_topk",         # term-filtered tf, broadcast corpus scalars
    "tpch_q3",                # pushdown below 3-way join + TakeOrdered top-10
    "tpch_q5",                # 6-table join, broadcast dim chain
    "funnel_steps",           # chained per-user conditional aggs, 1 shuffle key
    "graph_triangles",        # oriented-edge wedge equi-join
    "text_tfidf_topk",        # (doc,term) tally + df join + top-k window
    "json_variant",           # VARIANT parse/get, map-only
]


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(master="local[4]", app_name="jers-plans")
    qs = dict(registry.all_queries())
    qs.update(registry.PENDING_QUERIES)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/PLANS.md", "w") as f:
        f.write(f"# Physical plans ({sf}, {time.strftime('%Y-%m-%d')})\n\n"
                "`.explain('formatted')` for the headline queries — the "
                "plans the engine actually runs. Gated invariants live in "
                "tests/test_plan_quality.py; this file is the read-along "
                "evidence.\n")
        for name in SHOW:
            f.write(f"\n## {name}\n\n```\n")
            f.write(formatted_plan(qs[name](spark, sf)).strip())
            f.write("\n```\n")
    registry.clear_caches()
    spark.stop()
    print("BENCH/PLANS.md written")


if __name__ == "__main__":
    main()
