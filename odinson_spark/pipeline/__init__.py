"""Distributed pipeline stages (tokenize → prefilter → match → triples → KG)."""
