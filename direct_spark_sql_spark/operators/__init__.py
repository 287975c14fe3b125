"""LLM-data-pipeline operators (north-star extensions beyond the reference's
relational surface — SURVEY.md §7.2 item 6): deduplication, similarity
search, text analysis, multimodal column handling.

Design rules for 100 TB (BASELINE.json):

- Every operator is DataFrame → DataFrame; nothing collects to the driver.
- Candidate generation is always *bucketed* (LSH bands, SimHash bands,
  shingle blocking) so no all-pairs join ever materializes.
- Hash functions are the cross-engine-deterministic MD5 family
  (direct_spark_sql_spark.hashing) so every probabilistic operator is
  byte-reproducible — and oracle-checkable in DuckDB.
- Hot paths stay in pyspark.sql.functions (JVM codegen); Pandas UDFs appear
  only where built-ins can't express the computation (multimodal decode).
"""
