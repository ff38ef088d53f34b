"""monzo_data_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing semantics of the reference
ETL pipeline (``tom-troughton/monzo-data-pipeline``) as an idiomatic
Spark engine: declarative DataFrame/SQL plans optimized by Catalyst,
executed by Tungsten, scaled by partitioning/AQE — plus the
LLM-data-pipeline extension operators (dedup, similarity search,
multimodal columns, text analysis) the reference never had.

Layout:
    session.py    SparkSession factory with scale-aware defaults
    schemas.py    explicit StructTypes (medallion tables + testdata)
    catalog.py    parquet table loading / temp-view registration
    operators/    relational operators (SURVEY.md §2.A/§2.B)
    functions/    scalar & text/vector column functions
    ext/          extension operators (SURVEY.md §2.C + north star)
    pipeline/     medallion bronze→silver→gold orchestration
    streaming/    Structured Streaming (watermarked windows)
    registry.py   query registry consumed by __spark_entry__.py
"""

__version__ = "0.1.0"
