"""spark-submit entry point (BASELINE.json: "runs via spark-submit
--py-files on multi-executor clusters").

Usage::

    spark-submit --py-files jers.zip jobs/run_pipeline.py \
        --sf-dir /root/testdata/sf0.001 --out /tmp/kg_out --run-id r1 [--resume]

Package the library with ``python jobs/make_pyfiles.py`` (writes jers.zip).
In local mode, plain ``python jobs/run_pipeline.py`` works too.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from joint_entity_and_relation_extraction_spark.plans.pipeline import run_pipeline
from joint_entity_and_relation_extraction_spark.session import build_session


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--run-id", default="r0")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--skew", action="store_true")
    ap.add_argument("--master", default=None)
    ap.add_argument("--warc-dir", default=None,
                    help="ingest web pages from a WARC-lite crawl "
                         "directory (sources/warclite.py) instead of the "
                         "synthetic parquet-backed corpus; --sf-dir still "
                         "supplies the linking dictionary")
    a = ap.parse_args()
    spark = build_session(master=a.master, app_name=f"jers-kg-{a.run_id}")
    pages = None
    if a.warc_dir:
        from pyspark.sql import functions as F

        from joint_entity_and_relation_extraction_spark.sources.warclite import (
            WarcLiteDataSource)

        spark.dataSource.register(WarcLiteDataSource)
        pages = (spark.read.format("warclite").option("path", a.warc_dir)
                 .load()
                 .withColumn("warc_ts", F.to_timestamp("warc_ts")))
    res = run_pipeline(spark, a.sf_dir, a.out, run_id=a.run_id,
                       resume=a.resume, skew=a.skew, pages=pages)
    n = res["triples"].count()
    print(f"run_id={a.run_id} triples={n} recomputed_langs="
          f"{res['recomputed_langs']} stats={res['stats']}")
    spark.stop()


if __name__ == "__main__":
    main()
