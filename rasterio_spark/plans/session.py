"""SparkSession builder tuned for the engine.

Local-mode defaults mirror what a 1000-executor cluster deployment
would set per-executor: AQE on (runtime re-plan + skew-join split),
shuffle partitions ~ cores, Arrow enabled for pandas-UDF hot paths,
UTC session timezone (oracle comparisons against DuckDB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "rasterio_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    # Python workers must be able to unpickle UDF closures that
    # reference this package regardless of the driver's cwd: ship the
    # package root on the executors' PYTHONPATH (on a real cluster the
    # deployment does this with --py-files / a conda env).
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    worker_pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in worker_pp.split(os.pathsep):
        worker_pp = f"{pkg_root}{os.pathsep}{worker_pp}" if worker_pp else pkg_root
        # local mode: workers inherit the driver process env, which must
        # be set before the JVM (and its python worker daemon) launches
        os.environ["PYTHONPATH"] = worker_pp
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # catalog tables (sources/bucketed.py) — keep the warehouse out
        # of whatever cwd the driver happens to run from
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/rasterio_spark_warehouse"),
        )
        .config("spark.executorEnv.PYTHONPATH", worker_pp)
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
