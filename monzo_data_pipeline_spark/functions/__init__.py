"""Column-level functions: scalar, deterministic-aggregation, text, vector."""
