"""DataFrame-level operators: tiler, spatial joins, dedup, text analysis."""
