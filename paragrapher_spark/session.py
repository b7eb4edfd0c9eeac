"""SparkSession construction with scale-oriented defaults.

Mirrors the reference's tuning knobs (`src/webgraph.c:361-373`: 64M-edge
buffers, #cores..2x#cores concurrent buffers) as Spark confs: partition
sizing via ``spark.sql.files.maxPartitionBytes`` / shuffle partitions, and
AQE for runtime re-planning (coalesce + skew-join) which the reference had
to hand-roll with its edge-balanced block partitioner
(`src/webgraph.c:957-1005`).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Target rows per shuffle partition for iterative kernels at local scale.
#: At cluster scale this is superseded by AQE advisory sizing.
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("PG_SPARK_SHUFFLE_PARTITIONS", "32"))


def _default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    return f"local[{cpus}]" if cpus else "local[*]"


def _default_driver_mem() -> str:
    """Local-mode heap default: ~40% of physical RAM, capped at 48g (the
    driver hosts all executor threads in local mode; the JVM's 1g default
    OOMs caching multi-10M-row tables). Env PG_SPARK_DRIVER_MEM overrides;
    on hosts where sysconf is unavailable, fall back to a conservative 4g."""
    override = os.environ.get("PG_SPARK_DRIVER_MEM")
    if override:
        return override
    try:
        total = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        gb = max(1, min(48, int(total * 0.4 / (1 << 30))))
        return f"{gb}g"
    except (ValueError, OSError, AttributeError):
        return "4g"


def get_spark(
    app_name: str = "paragrapher-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    Notes on the defaults:

    - AQE on (coalesce + skew join): replaces the reference's runtime
      edge-balanced re-blocking (`src/webgraph.c:957-1005`) for joins whose
      key distribution is power-law.
    - Arrow enabled: the JVM<->Python Arrow channel plays the role of the
      reference's /dev/shm producer/consumer transport
      (`src/webgraph.c:843-889`).
    - ``spark.sql.shuffle.partitions`` small in local mode; on a real
      cluster leave it to AQE (`advisoryPartitionSizeInBytes`).
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or _default_master())
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Iterative kernels re-join a small-ish rank/label table against a
        # huge edge table; keep broadcast threshold generous locally. On a
        # 100 TB cluster the vertex table exceeds this and Spark falls back
        # to shuffle joins over the co-partitioned edge table — by design.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "zstd")
        # local-mode JVM defaults to 1g heap; the driver hosts all
        # executor threads here, so give it real memory (no-op if the JVM
        # for this session already exists)
        .config("spark.driver.memory", _default_driver_mem())
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
