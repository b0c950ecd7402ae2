"""Data pipeline: channel schema, datasets, samplers, normalization."""
