"""Deterministic synthesizers and table loaders."""
