#!/usr/bin/env python
"""Per-query isolation bench + plan capture (guide §1.4/§7.2) for the
optimization round. NOT the driver bench — bench.py is frozen; this file
exists so plan/timing claims in OPTIMIZATION_r08.md are reproducible.

Usage:
  python bench_extra.py [--plans-tag before|after] [--queries a,b,c]
      [--sink noop|count] [--repeats 3]

For every selected query it:
  - labels the job (setJobDescription),
  - times `repeats` runs with the chosen sink (default noop: computes
    every column, unlike bench.py's count() which lets Catalyst prune —
    both are reported so numbers can be compared with the frozen bench),
  - writes plans/r08/<query>_<tag>.txt with explain("formatted").
Prints one JSON line with the median seconds per query.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DEFAULT_QUERIES = [
    "graph_degrees", "dedup_edit_verify", "dedup_substring_spans",
    "text_bigram_logprob", "dedup_minhash_incremental", "graph_degrees_lsh",
    "dedup_minhash_lsh", "ann_topk_bruteforce", "kg_extract_text",
    "join_sortmerge", "window_topk_per_group", "tpch_q5", "dedup_exact",
    "text_repetition", "text_token_stats", "curation_select",
    "agg_group_multi", "join_broadcast", "explode_array",
    "pivot_event_type",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-tag", default=None,
                    help="write plans/r08/<q>_<tag>.txt (omit to skip)")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--sink", default="noop", choices=["noop", "count"])
    ap.add_argument("--repeats", type=int, default=3,
                    help="0 = plan capture only, no timed runs")
    ap.add_argument("--full-plans", action="store_true",
                    help="bypass localCheckpoint during PLAN CAPTURE only, "
                    "so explain() shows the full subtree instead of 'Scan "
                    "ExistingRDD' stubs (checkpoints truncate lineage by "
                    "design; timing runs are never patched)")
    args = ap.parse_args()

    from joint_entity_and_relation_extraction_spark.plans import registry
    from joint_entity_and_relation_extraction_spark.session import build_session

    names = (args.queries.split(",") if args.queries else DEFAULT_QUERIES)
    spark = build_session(master=f"local[{CPUS}]", app_name="jers-bench-extra")
    qs = dict(registry.all_queries())
    qs.update(registry.PENDING_QUERIES)

    # same worker warmup as bench.py so the first timed query is not a
    # cold python-worker measurement
    import bench as B
    B._warmup(spark)

    here = os.path.dirname(os.path.abspath(__file__))
    plan_dir = os.path.join(here, "plans", "r08")
    os.makedirs(plan_dir, exist_ok=True)

    out: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    loads: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        if args.plans_tag:
            try:  # Spark 4: instances are the classic subclass, which
                # overrides localCheckpoint — patch the class they use
                from pyspark.sql.classic.dataframe import DataFrame as _DF
            except ImportError:
                from pyspark.sql import DataFrame as _DF
            real_ckpt = _DF.localCheckpoint
            if args.full_plans:
                _DF.localCheckpoint = lambda self, eager=True: self
            try:
                df = fn(spark, SF_DIR)
                jvm = spark.sparkContext._jvm
                mode = (jvm.org.apache.spark.sql.execution.ExplainMode
                        .fromString("formatted"))
                with open(os.path.join(
                        plan_dir, f"{name}_{args.plans_tag}.txt"), "w") as f:
                    f.write(df._jdf.queryExecution().explainString(mode))
            finally:
                _DF.localCheckpoint = real_ckpt
        if args.repeats == 0:
            registry.clear_caches()
            continue
        secs, lds = [], []
        for _ in range(args.repeats):
            lds.append(round(os.getloadavg()[0], 1))
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            secs.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = round(statistics.median(secs), 3)
        runs[name] = secs
        loads[name] = lds
        registry.clear_caches()
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "sink": args.sink,
                      "median": out, "runs": runs, "load1": loads}))


if __name__ == "__main__":
    main()
