"""Deterministic annotation stage (replaces the reference's NLP processors)."""
