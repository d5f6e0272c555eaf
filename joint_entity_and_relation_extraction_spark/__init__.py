"""PySpark-native knowledge-graph construction engine.

A brand-new, Spark-first re-realization of the capabilities of the
reference repo ``jojowither/Joint_Entity_and_Relation_Extraction``
(joint NER + relation extraction; see SURVEY.md — the checkout at
/root/reference is empty, so all reference claims are public-knowledge
reconstructions tagged in SURVEY.md §0).

Layout
------
- ``functions/``   pure-Python/numpy deterministic kernels (NO pyspark imports)
                   shared between the Spark path and the single-process oracle
- ``operators/``   Spark DataFrame operators (extraction, linking,
                   canonicalization, dedup, similarity, text stats, lineage)
- ``sources/``     IO: parquet helpers + IcebergLite table layer
- ``plans/``       end-to-end pipeline composition + the relational query corpus
- ``streaming/``   Structured Streaming ingest path

Everything is pyspark.sql DataFrame + vectorized Arrow/pandas UDFs —
no per-row Python UDFs on the hot path (BASELINE.json input_hint).
"""

import os as _os

# single-threaded BLAS everywhere (driver, oracle, Spark python workers):
# the model kernels are 64–128-dim — thread fan-out costs more than it
# saves; Spark partitions supply the parallelism. Must run before numpy
# loads its BLAS, so this sits at package import time.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS"):
    _os.environ.setdefault(_v, "1")

__version__ = "0.1.0"

SEED = 42
