"""Batch sources & sinks (SURVEY.md §2 A5/A6 generalized)."""
