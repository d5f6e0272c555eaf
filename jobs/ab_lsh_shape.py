#!/usr/bin/env python
"""Paired A/B for the two r05 suite movers (VERDICT r05 item 3).

BENCH_r05 measured dedup_minhash_lsh +48% and ann_topk_bruteforce +91%
vs r04 — but the query suite ran AFTER the headline, in a window whose
loadavg had climbed to ~30 (BENCH_r05 attr_loadavg), and the suite had
no quiet-window guard of its own (fixed in bench.py this round).
ann_bruteforce's code did not change at all in r05; the lsh suspect was
the read_docs cluster-width scan (commit 1e8c8b4). This job settles it
by measurement: one process at local[N], warmed, then ALTERNATING
repeats of (lsh with read_docs) / (lsh with the r04 read_table shape) /
(ann_bruteforce), so every configuration sees the same window. Medians
+ per-run loadavg printed as one JSON line.

Run: python jobs/ab_lsh_shape.py [--cpus 32] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    a = ap.parse_args()

    from pyspark.sql import functions as F

    from joint_entity_and_relation_extraction_spark.operators import (
        dedup as DD,
        similarity as SIM,
    )
    from joint_entity_and_relation_extraction_spark.session import build_session
    from joint_entity_and_relation_extraction_spark.sources.io import (
        read_table)

    spark = build_session(master=f"local[{a.cpus}]", app_name="ab-lsh")
    # warm workers: import + signature pool in every worker (bench._warmup
    # shape, minus the model stage this job never runs)
    spark.range(2 * a.cpus, numPartitions=2 * a.cpus).select(
        DD.minhash_bands_udf(F.array(F.col("id"))).alias("b")).count()

    real_read_docs = DD.read_docs
    variants = {
        "lsh_read_docs_r05": lambda: DD.minhash_lsh_pairs(
            spark, SF_DIR, n=2, threshold=0.2).count(),
        "lsh_read_table_r04": None,  # set below (monkeypatched scan)
        "ann_bruteforce": lambda: SIM.ann_bruteforce(
            spark, SF_DIR, n_queries=8, k=5).count(),
    }

    def lsh_r04():
        DD.read_docs = lambda s, d: read_table(s, d, "documents")
        try:
            return DD.minhash_lsh_pairs(spark, SF_DIR, n=2,
                                        threshold=0.2).count()
        finally:
            DD.read_docs = real_read_docs

    variants["lsh_read_table_r04"] = lsh_r04

    times: dict[str, list[float]] = {k: [] for k in variants}
    loads: list[float] = []
    counts: dict[str, int] = {}
    for _ in range(a.repeats):
        for name, fn in variants.items():  # alternate inside each round
            loads.append(round(os.getloadavg()[0], 1))
            t0 = time.monotonic()
            counts[name] = fn()
            times[name].append(round(time.monotonic() - t0, 3))
    spark.stop()
    print(json.dumps({
        "sf_dir": SF_DIR, "cpus": a.cpus,
        "medians": {k: statistics.median(v) for k, v in times.items()},
        "all_runs": times, "counts": counts, "load1_per_run": loads,
    }))


if __name__ == "__main__":
    main()
