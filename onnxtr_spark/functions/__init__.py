"""Corpus-scale training-data operators (Spark-first, JVM-side).

Everything in this package is pure ``pyspark.sql.functions`` column
algebra — no Python UDFs anywhere — so Catalyst gets full pushdown,
pruning and whole-stage codegen, and the plans scale to the 100 TB
target by construction. Each operator ships with a DuckDB oracle SQL
generator kept in the same module so the pair can never drift.
"""
