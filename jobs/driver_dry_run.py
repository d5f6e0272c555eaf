#!/usr/bin/env python
"""Driver-flow dry run: execute the EXACT per-round correctness gate
locally — the first ``registry.DRIVER_WINDOW`` entries of
``__spark_entry__.queries()`` in dict order at sf0.01, each compared
against its ``oracle_sql()`` via DuckDB (row count + sorted column names
+ order-insensitive exact values, the same canon as
tests/parity_util.py), rows-only queries through the driver's
toPandas+hash path. Writes a CORRECTNESS-preview JSON so the window can
be validated end-to-end before submit instead of discovered in the
round artifact.

Run: python jobs/driver_dry_run.py [--out /tmp/CORRECTNESS_preview.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/CORRECTNESS_preview.json")
    ap.add_argument("--cpus", type=int, default=8)
    a = ap.parse_args()

    import __spark_entry__ as entry
    from joint_entity_and_relation_extraction_spark.plans import registry
    from joint_entity_and_relation_extraction_spark.session import build_session
    from parity_util import canon, driver_canon, make_con

    spark = build_session(master=f"local[{a.cpus}]", app_name="driver-dry-run")
    con = make_con(SF_DIR)
    qs, osql = entry.queries(), entry.oracle_sql()
    window = list(qs)[: registry.DRIVER_WINDOW]
    out: dict[str, dict] = {}
    t_all = time.monotonic()
    for name in window:
        rec: dict = {"rows_match": None, "schema_match": None,
                     "hash_match": None, "spark_rows": None,
                     "oracle_rows": None, "err": None}
        t0 = time.monotonic()
        try:
            pdf = qs[name](spark, SF_DIR).toPandas()
            rec["spark_rows"] = len(pdf)
            if name in osql:
                want = con.execute(osql[name]).df()
                rec["oracle_rows"] = len(want)
                rec["rows_match"] = len(pdf) == len(want)
                gc, gr = canon(pdf)
                wc, wr = canon(want)
                rec["schema_match"] = gc == wc
                rec["hash_match"] = gr == wr
            else:
                driver_canon(pdf)  # raises on non-hashable cells
                rec["err"] = "no_oracle"
        except Exception as ex:  # noqa: BLE001 — recorded, like the driver
            rec["err"] = f"{type(ex).__name__}: {ex}"[:300]
        rec["sec"] = round(time.monotonic() - t0, 2)
        out[name] = rec
        status = ("HASH-GREEN" if rec["hash_match"]
                  else rec["err"] or "MISMATCH")
        print(f"{name}: {status} ({rec['sec']}s)", flush=True)
    registry.clear_caches()
    spark.stop()
    with open(a.out, "w") as f:
        json.dump(out, f, indent=2)
    n_green = sum(1 for r in out.values() if r["hash_match"])
    n_rows_only = sum(1 for r in out.values() if r["err"] == "no_oracle")
    n_bad = sum(1 for r in out.values()
                if r["hash_match"] is False or (
                    r["err"] and r["err"] != "no_oracle"))
    print(json.dumps({"window": len(out), "hash_green": n_green,
                      "rows_only": n_rows_only, "bad": n_bad,
                      "sec": round(time.monotonic() - t_all, 1),
                      "out": a.out}))


if __name__ == "__main__":
    main()
