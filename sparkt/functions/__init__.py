"""LLM-data-pipeline operator library (BASELINE.json extension surface):
text analysis, deduplication, similarity search, multimodal columns.

Everything here is built from JVM-side ``pyspark.sql.functions``
(whole-stage codegen; zero row-at-a-time Python) except the multimodal
decode plumbing, which is Arrow-batched ``mapInPandas`` by necessity.
All hashing uses md5 hex strings so results are reproducible across
engines (the DuckDB oracle computes the identical values).
"""
