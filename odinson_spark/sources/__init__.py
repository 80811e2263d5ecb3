"""Sources & sinks: reference-format document JSON, mention serialization,
and the table-IO abstraction (parquet locally, Iceberg on a cluster)."""
