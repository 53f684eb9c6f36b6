"""LLM-data-pipeline operators: dedup, similarity search, vector
compression (scalar + product quantization), text analysis, multimodal
columns, time-series joins (as-of / interval / gap-fill), SCD2 and MERGE
lakehouse verbs, data-quality rules, and skew mitigation.  All are built
Spark-first: column expressions and built-in functions on the hot path,
pandas UDFs only where semantics genuinely require Python."""
