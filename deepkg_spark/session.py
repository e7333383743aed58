"""SparkSession factory with scale-appropriate defaults.

Local sandbox runs on local[N]; the same config block is what we would ship
via spark-submit to a multi-executor cluster (AQE, skew-join handling,
Arrow batching). Nothing here is sandbox-specific except the master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle/spill files on tmpfs when the host provides one: the sandbox VM
# disk is the one resource that does not scale with cores (measured: the
# node/edge shuffle flatlines 8 -> 32 cores on /tmp but scales on /dev/shm).
# On a real cluster this maps to fast local NVMe / remote shuffle service.
_LOCAL_DIR = "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else None


def get_spark(
    app_name: str = "deepkg_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    active_processors: int | None = None,
) -> SparkSession:
    """`active_processors` pins -XX:ActiveProcessorCount so a local[N] JVM
    sizes GC/JIT/IO thread pools for N CPUs — required for honest N-vs-4N
    scaling measurements (otherwise a local[2] JVM quietly uses 20+ cores
    for background threads and under-reports the speedup of more cores)."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # local[N] -> N concurrent tasks; shuffle partitions ~ cores at test scale.
    # On a real cluster this is set to ~2-3x total executor cores, and AQE
    # coalesces the excess at runtime.
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = cpus if n == "*" else int(n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("DEEPKG_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # scan-parallelism FLOOR derived from the session's core count: a
        # single sub-128MB input file must not serialize its whole narrow
        # stage onto 1-2 tasks (the optimization guide's input-skew case).
        # Scale-adaptive by construction — on a cluster `cpus` is the total
        # executor core count, and AQE still coalesces the other direction.
        # Parquet caps effective parallelism at the file's row-group count.
        .config("spark.sql.files.minPartitionNum",
                os.environ.get("DEEPKG_MIN_PARTITION_NUM", str(cpus)))
    )
    if _LOCAL_DIR:
        os.makedirs(_LOCAL_DIR, exist_ok=True)
        builder = builder.config("spark.local.dir", _LOCAL_DIR)
    if active_processors:
        builder = builder.config(
            "spark.driver.extraJavaOptions",
            f"-XX:ActiveProcessorCount={active_processors}",
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
