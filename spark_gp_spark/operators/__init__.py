"""LLM-data-pipeline operators: dedup, similarity search, text analysis,
multimodal columns, as-of joins.  All are built Spark-first: column
expressions and built-in functions on the hot path, pandas UDFs only where
semantics genuinely require Python."""
