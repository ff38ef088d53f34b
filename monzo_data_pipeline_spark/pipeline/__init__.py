"""Medallion pipeline: bronze ingest → silver normalize → gold aggregate.

Re-expresses the reference's lambda_handler orchestration
(/root/reference/src/main.py:19-85) as Spark jobs over parquet tables
— no SQLite file round-trip, no row-at-a-time loops.
"""
