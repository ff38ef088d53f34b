"""Table loading / catalog registration for the testdata star schema.

The reference "catalog" is three CREATE TABLE scripts executed once
against SQLite (/root/reference/src/utils/initialise_database.py:7-14).
Here the catalog is: parquet directories + declared StructTypes +
(optionally) temp views so both the DataFrame API and spark.sql can
reach every table.

Scale note: `spark.read.schema(...).parquet(path)` skips schema
inference (no footer-sampling job) and keeps the vectorized reader on
the declared types; at 100 TB each table would be a partitioned
directory and nothing in this module would change except the path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import TESTDATA_SCHEMAS, TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# events.parquet has shipped with ts as either timestamp[ns] or
# timestamp[us] across testdata generations. For the ns flavor,
# spark.sql.legacy.parquet.nanosAsLong=true reads raw nanos and we
# truncate to µs — bit-identical to DuckDB's ns→µs read. For the us
# flavor a plain TimestampType read is already exact. The physical
# type is sniffed once per path from the parquet footer (driver-side,
# cached — no job).
_EVENTS_READ_SCHEMA = T.StructType(
    [
        f if f.name != "ts" else T.StructField("ts", T.LongType())
        for f in TESTDATA_SCHEMAS["events"].fields
    ]
)

_EVENTS_TS_UNIT_CACHE: dict[str, str] = {}


def _events_ts_unit(path: str) -> str:
    """'ns' or 'us' — physical unit of events.ts, from the footer."""
    unit = _EVENTS_TS_UNIT_CACHE.get(path)
    if unit is None:
        import pyarrow.parquet as pq

        first = path
        if os.path.isdir(path):
            parts = [p for p in sorted(os.listdir(path)) if p.endswith(".parquet")]
            first = os.path.join(path, parts[0])
        t = pq.read_schema(first).field("ts").type
        # plain INT64 (no timestamp logical type) = raw nanos layout
        unit = getattr(t, "unit", "ns")
        _EVENTS_TS_UNIT_CACHE[path] = unit
    return unit


def _pin_session_confs(spark: SparkSession) -> None:
    """Defensively pin the runtime-settable confs correctness depends on.

    The driver harness passes its OWN SparkSession into queries(); it
    won't have this engine's session-factory configs. Timestamp
    semantics (UTC) and the events ns-read shim are both dynamic SQL
    confs, so pin them at the read chokepoint every query goes through.
    """
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # noqa: BLE001 — a locked-down conf is non-fatal here
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with its declared schema."""
    if name not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    _pin_session_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events" and _events_ts_unit(path) == "ns":
        raw = spark.read.schema(_EVENTS_READ_SCHEMA).parquet(path)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.schema(TESTDATA_SCHEMAS[name]).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All testdata tables as a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
