"""Standalone (no-Spark) scaling probe for the model kernel.

Isolates the python-worker compute from the engine entirely: N independent
OS processes each run functions.model.extract_batch over the same fixture
sentence set in a loop, pinned to 1 BLAS thread, and we measure aggregate
sentences/sec at two process counts. If THIS ratio already shows the
2->8 loss seen in bench.py's scaling pair, the loss is host memory
bandwidth / cache contention in the kernel itself — not a Spark plan,
shuffle, or Arrow problem (VERDICT r04 item 1 attribution).

Usage: python jobs/kernel_scaling_probe.py [nprocs ...]  (default: 2 8)
Prints one JSON line per process count plus a final efficiency line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS"):
    os.environ[_v] = "1"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SECONDS = float(os.environ.get("KERNEL_PROBE_SECS", "12"))


def _sentences() -> list[list[str]]:
    """A deterministic workload: the sf0.001 fixture corpus' sentence
    token lists (same length/token distribution the bench pipeline feeds
    the model) — read with pyarrow, no Spark anywhere in this probe."""
    import pyarrow.parquet as pq

    from joint_entity_and_relation_extraction_spark.functions import text as T

    texts = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    sents: list[list[str]] = []
    for txt in texts:
        sents.extend(s["tokens"] for s in T.sentences(txt or ""))
    return sents


def _worker(go_evt, out_q, seconds: float) -> None:
    from joint_entity_and_relation_extraction_spark.functions import model as M

    sents = _sentences()
    M.weights()
    M.extract_batch(sents[:64])  # warm buffers
    go_evt.wait()  # parent releases all workers at once
    t0 = time.monotonic()
    done = 0
    while time.monotonic() - t0 < seconds:
        M.extract_batch(sents)
        done += len(sents)
    dt = time.monotonic() - t0
    out_q.put((done, dt))


def run_point(nprocs: int) -> float:
    ctx = mp.get_context("spawn")
    go_evt = ctx.Event()
    q = ctx.Queue()
    procs = [ctx.Process(target=_worker, args=(go_evt, q, SECONDS))
             for _ in range(nprocs)]
    load0 = os.getloadavg()[0]
    for p in procs:
        p.start()
    time.sleep(8)  # let every worker finish its warmup before the gun
    go_evt.set()
    rates = []
    for _ in procs:
        done, dt = q.get()
        rates.append(done / dt)
    for p in procs:
        p.join()
    total = sum(rates)
    print(json.dumps({"nprocs": nprocs, "sents_per_sec": round(total, 1),
                      "per_proc": [round(r, 1) for r in sorted(rates)],
                      "load1": [round(load0, 1),
                                round(os.getloadavg()[0], 1)]}))
    return total


def main() -> None:
    points = [int(a) for a in sys.argv[1:]] or [2, 8]
    rates = {n: run_point(n) for n in points}
    ns = sorted(rates)
    for lo, hi in zip(ns, ns[1:]):
        eff = (rates[hi] / rates[lo]) / (hi / lo)
        print(json.dumps({"pair": f"{lo}->{hi}",
                          "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
