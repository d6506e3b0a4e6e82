"""Run planning: checkpoint manifests, lineage, resumability, metrics."""
