"""Structured Streaming surface (the batch reference has no streaming; this
is the Spark-native analogue of its incremental index)."""
