"""Training-data pipeline operators (dedup, similarity, text analysis,
multimodal plumbing) — first-class components alongside the extraction
engine; each has a DuckDB-oracle-compatible definition."""
