"""Spark DataFrame operators (the engine's verbs).

Each module composes built-in pyspark.sql functions first; Python appears
only inside Arrow-vectorized pandas UDFs / mapInPandas stages (BASELINE.json
input_hint: "no per-row Python" — i.e. no row-at-a-time Python UDFs).
"""
