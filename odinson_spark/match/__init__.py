"""Per-sentence match engine (executor-side, runs inside Arrow batches)."""
