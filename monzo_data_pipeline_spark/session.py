"""SparkSession factory.

Scale posture: these configs are chosen so the same code runs on
local[N] for tests and on a 1000-executor cluster against ~100 TB —
AQE handles runtime re-planning (partition coalescing, skew joins,
broadcast demotion/promotion), and we never hand-schedule what
Catalyst already optimizes.

The reference has no session concept — it opens a sqlite3 connection
per run (/root/reference/src/load/load.py:250). Here one SparkSession
is shared across the whole query suite (BASELINE.md: reuse the
session to amortize JVM startup).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "monzo-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Notes on each config (all public Spark knobs):
      - AQE on: runtime coalescing of shuffle partitions + skew-join
        splitting; at 100 TB this is what keeps a fixed
        ``shuffle.partitions`` from being wrong in both directions.
      - ``spark.sql.session.timeZone=UTC``: the reference mixes naive
        local and Z-suffixed timestamps (load.py:47 vs
        api_client.py:179-187); engine policy is UTC everywhere so
        results are oracle-comparable.
      - Arrow on: any pandas interop (toPandas, pandas UDFs in
        ext/) moves columnar, not row-at-a-time pickles.
      - parquet filter pushdown / column pruning are Spark defaults;
        left explicit here as documentation of the scan contract.
    """
    # Executor Python workers are separate processes; make this package
    # importable there regardless of the driver's cwd (local mode inherits
    # PYTHONPATH from the driver's environment).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{existing}" if existing else repo_root
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.parquet stores timestamp[ns]; Spark's vectorized
        # reader refuses ns→TimestampType, so read ns as long and convert
        # in catalog.load_table (exactly DuckDB's truncate-to-µs behavior).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # write timestamps as annotated INT64 micros, not legacy INT96:
        # INT96 footers defeat the catalog's ts-unit sniffing and every
        # modern reader (DuckDB, pyarrow) treats INT96 as deprecated
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # custom Python data sources (sources/api_source.py) push
        # created-range predicates into the REST cursor window
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # shuffle/spill scratch on tmpfs: at local[32] scale the shuffle
        # files are tiny but the create/fsync/delete churn showed up as
        # 50-70% kernel time in vmstat; memory-backed scratch removes it
        .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-scratch"))
        .config("spark.ui.enabled", "false")
        # size-first AQE coalescing: let the advisory partition size
        # (not defaultParallelism) govern post-shuffle partition counts.
        # The default parallelismFirst=true pins tiny stages at 32
        # near-empty tasks on this host; at 100 TB the SAME advisory
        # size yields thousands of right-sized partitions — this is the
        # setting Spark's own AQE docs recommend flipping off.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    )
    # SPARK_GRAFT_ANSI=1: run under ANSI SQL semantics — arithmetic
    # that would silently wrap/NULL in legacy mode raises instead. The
    # engine's exactness contracts are written to survive both (the
    # full oracle gate is CI'd under this flag too); production
    # deployments that prefer fail-fast arithmetic set it.
    if os.environ.get("SPARK_GRAFT_ANSI") == "1":
        builder = builder.config("spark.sql.ansi.enabled", "true")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # reliable-checkpoint dir for iterative operators (ext/lineage.py):
    # point at HDFS/S3 on a cluster; unset → localCheckpoint fallback
    ckpt = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ckpt and not spark.sparkContext._jsc.sc().getCheckpointDir().isDefined():
        spark.sparkContext.setCheckpointDir(ckpt)
    return spark
