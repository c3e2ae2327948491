"""vacancy_analyser_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the Digital-UrFU/vacancy_analyser reference
(labor-market data lake: ingest → SCD2-lite merge → columnar analytics →
monitoring) as idiomatic Spark SQL / DataFrame / Structured Streaming code,
plus the LLM-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal plumbing) needed at 100 TB scale.

Blueprint: /root/repo/SURVEY.md. Reference cited per-module as file:line
into /root/reference/ (semantics only — no code is derived from it).
"""

__version__ = "0.1.0"
