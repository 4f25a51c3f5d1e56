"""SparkSession factory.

Replaces the reference's connection factories (``load_pool`` /
``load_session``, reference src/orm/cassandra_util.py:19-20 and
src/orm/sqlalchemy_model.py:89-96): one SparkSession + catalog instead of
per-query Cassandra/Postgres connections.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(
    app_name: str = "tsengine",
    master: str | None = None,
    shuffle_partitions: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    - AQE on (runtime re-planning, skew-join handling at scale).
    - session timezone pinned to UTC so ``unix_timestamp``/casts are
      deterministic; calendar bucketing applies Europe/Madrid explicitly
      (reference analysis_utils.py:182-237).
    - Arrow enabled for the pandas-UDF compression kernels.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("TSENGINE_MASTER", f"local[{cpus}]")
    # Lazily-faulted VM memory (e.g. Firecracker snapshots) makes first-touch
    # page faults ~100x normal cost, which serializes allocation-heavy
    # parallel work.  Keep glibc arenas resident in the JVM and every Python
    # worker it forks: never trim, never mmap-and-return large blocks.
    # (Set via env so the JVM child and its Python workers inherit them.)
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_MMAP_MAX_", "0")
    # Shuffle/spill files on tmpfs: the sandbox block device serializes IO
    # the way a real executor's local NVMe does not.  OPT-IN ONLY
    # (TSENGINE_TMPFS_SHUFFLE=1, set by the bench harness): as a default it
    # would put every session's spill in RAM, so a shuffle that would have
    # completed on disk could OOM the box instead — a bench-substrate
    # control, not library behavior.
    if (
        os.environ.get("TSENGINE_TMPFS_SHUFFLE") == "1"
        and os.path.isdir("/dev/shm")
        and os.access("/dev/shm", os.W_OK)
    ):
        os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
        os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-tmp")
    jvm_opts = "-XX:+UseTransparentHugePages"
    if os.environ.get("TSENGINE_PRETOUCH") == "1":
        # Fault the whole heap once at JVM start (~25s for 6-8g on this VM)
        # so the measured region never page-faults.  Benchmarks only.
        jvm_opts += " -XX:+AlwaysPreTouch"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            shuffle_partitions or os.environ.get("TSENGINE_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("TSENGINE_DRIVER_MEMORY", "8g"))
        .config("spark.driver.extraJavaOptions", jvm_opts)
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def release_persistent_rdds(spark) -> int:
    """Unpersist every RDD still registered with the context (cached
    DataFrames AND localCheckpoint blocks, which ``catalog.clearCache``
    never reaches) and clear the SQL cache.  Returns the number released.

    Benchmark/pipeline hygiene between independent phases: leaked pinned
    blocks otherwise squeeze execution memory for the rest of the session
    (a leaked localCheckpoint per components round degraded the bench's
    tier phase 4x).  Never call it mid-query — a consumer of a persisted
    plan would silently recompute."""
    jsc = spark.sparkContext._jsc
    n = 0
    it = jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(False)
        n += 1
    spark.catalog.clearCache()
    return n
