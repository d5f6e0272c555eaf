"""Pure-Python/numpy deterministic kernels.

Modules here MUST NOT import pyspark: they are shared verbatim between
the Spark operators (wrapped in pandas/Arrow UDFs under ``operators/``)
and the single-process grading oracle (``oracle/pipeline_local.py``).
That sharing is what makes the "byte-identical per url" and
"P/R >= 0.95 vs reference" gates meaningful: the oracle run of this
exact code defines the reference (SURVEY.md §0.2, §5.2).
"""
