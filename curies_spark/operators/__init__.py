"""Data-scale operators: triple filters/ops, discovery, dedup, similarity, text."""
