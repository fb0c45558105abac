"""Spark operators: guarded extraction map, formatter projections, document
split/merge, dedup, similarity, text stats, skew handling, resume."""
