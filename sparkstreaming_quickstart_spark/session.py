"""Session construction and tuning.

Two situations:
  * We own the session (bench.py, tests, CLI): build it with `get_spark()`.
  * The driver owns the session (`__spark_entry__.entry/queries`): we may only
    set *runtime-settable* SQL confs -> `tune()` is safe to call on any session
    and is idempotent.

Scale notes (100 TB): AQE handles runtime partition coalescing and skew-join
splitting, so a static `spark.sql.shuffle.partitions` only needs to be an
upper bound (set ~2-3x total cores on a real cluster).  Arrow execution is on
for every pandas interchange.  All timestamps are UTC so results are
independent of cluster timezone.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

# Runtime-settable confs applied to any session we touch.  Keys must all be
# modifiable after session start (verified: none of these are static confs).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # The driver testdata stores events.ts as parquet TIMESTAMP(NANOS), which
    # Spark's reader rejects; read as long and convert (sources/catalog.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executors regardless of the driver's
    working directory (Python UDF closures reference it by module name).

    Zips the package once per process and registers it with addPyFile --
    the same mechanism a spark-submit --py-files deployment would use on a
    real cluster.
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(tempfile.gettempdir(), "ssq_spark_pkg.zip")
    if not _SHIPPED:  # rebuild once per process so edits are never stale
        tmp = f"{zip_path}.{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            os.path.basename(pkg_dir), os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
        os.replace(tmp, zip_path)
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # already registered in this context
    _SHIPPED.add(app_id)


def tune(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Apply runtime confs to an externally-owned session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf not recognized / locked down -> keep going
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        if spark.sparkContext.master.startswith("local"):
            # Local mode reads small single-file tables: the default 128 MB
            # split size leaves a 32-core box 3-way parallel on a 10 MB
            # parquet.  4 MB splits restore parallelism.  LOCAL ONLY -- on a
            # real cluster at 100 TB the 128 MB default is correct (4 MB
            # there would mean ~25M tasks).
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    except Exception:
        pass
    _ship_package(spark)
    return spark


def get_spark(
    app_name: str = "sparkstreaming-quickstart-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a tuned local session.

    Honors SPARK_GRAFT_CPUS for core count (bench contract).  On a real
    cluster, drop `master` and submit normally; every conf here is still
    appropriate.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return tune(spark, shuffle_partitions)
