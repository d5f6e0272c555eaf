"""Table-maintenance entry point for spark-submit — the operational
counterpart of jobs/run_pipeline.py, exposing the IcebergLite maintenance
surface on a deployed table:

    spark-submit --py-files jers.zip jobs/run_maintenance.py \
        --table /path/to/table compact
    ... expire --keep-last 3 --orphan-grace-secs 3600
    ... cluster --sort-cols o_totalprice
    ... zorder --sort-cols lang,source
    ... rollback --snapshot 4
    ... publish --snapshot 7
    ... as-of --ts 2026-01-01T00:00:00      (timestamp -> snapshot id)
    ... snapshots | files | partitions      (metadata tables, printed)

Every subcommand is a thin wrapper over sources/iceberglite.py (each
individually conflict-checked and pytest-gated there); this file only
parses arguments and reports what happened, so it stays trivially
auditable.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--table", required=True, help="IcebergLite table root")
    ap.add_argument("--master", default=os.environ.get(
        "SPARK_MASTER", "local[8]"))
    sub = ap.add_subparsers(dest="op", required=True)
    sub.add_parser("compact")
    p = sub.add_parser("expire")
    p.add_argument("--keep-last", type=int, default=1)
    p.add_argument("--orphan-grace-secs", type=float, default=3600.0)
    for name in ("cluster", "zorder"):
        p = sub.add_parser(name)
        p.add_argument("--sort-cols", required=True,
                       help="comma-separated sort columns")
    for name in ("rollback", "publish"):
        p = sub.add_parser(name)
        p.add_argument("--snapshot", type=int, required=True)
    p = sub.add_parser("as-of")
    p.add_argument("--ts", required=True,
                   help="ISO-8601 timestamp to resolve (TIMESTAMP AS OF)")
    for name in ("snapshots", "files", "partitions"):
        sub.add_parser(name)
    args = ap.parse_args()

    from joint_entity_and_relation_extraction_spark.session import build_session
    from joint_entity_and_relation_extraction_spark.sources import iceberglite as il

    # metadata-only ops need no session
    if args.op == "rollback":
        print(f"rollback: new snapshot {il.rollback_to(args.table, args.snapshot)}")
        return
    if args.op == "publish":
        print(f"published snapshot {il.publish(args.table, args.snapshot)}")
        return
    if args.op == "as-of":
        print(f"as-of {args.ts}: snapshot "
              f"{il.resolve_as_of(args.table, args.ts)}")
        return
    if args.op == "expire":
        removed = il.expire_snapshots(
            args.table, keep_last=args.keep_last,
            orphan_grace_secs=args.orphan_grace_secs)
        print(f"expire: reclaimed {len(removed)} orphan dirs: {removed}")
        return

    spark = build_session(master=args.master, app_name="jers-maintenance")
    try:
        if args.op == "compact":
            print(f"compact: new snapshot {il.compact(spark, args.table)}")
        elif args.op in ("cluster", "zorder"):
            cols = args.sort_cols.split(",")
            snap = il.cluster_by(spark, args.table, cols,
                                 zorder=(args.op == "zorder"))
            print(f"{args.op} by {cols}: new snapshot {snap}")
        else:  # metadata tables
            rows = il.metadata_table(spark, args.table, args.op).collect()
            for r in rows:
                print(r.asDict())
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
