"""SparkSession factory with the scale posture baked in.

Every knob here is chosen for the 100 TB / 1000-executor target and
merely *exercised* at local[N] test scale (SURVEY.md §4.2):

- AQE on: runtime broadcast-vs-SMJ on the alias join, skew-join
  splitting for Zipf-skewed domains, small-partition coalescing.
- Arrow batches ~2k rows: wide text/binary rows must not OOM the
  Python workers (SURVEY.md §4.3.4).
- UTC session timezone: deterministic timestamp semantics vs DuckDB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def _available_mem_bytes() -> int | None:
    """The memory actually available to this process: min of host
    MemTotal and any cgroup limit.  Inside a cgroup-limited container
    /proc/meminfo reports HOST RAM, so reading it alone would size the
    driver -Xmx above the real limit and get the JVM OOM-killed."""
    candidates = []
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    candidates.append(int(line.split()[1]) * 1024)
                    break
    except OSError:
        pass
    for path in ("/sys/fs/cgroup/memory.max",                 # cgroup v2
                 "/sys/fs/cgroup/memory/memory.limit_in_bytes"):  # v1
        try:
            with open(path) as f:
                raw = f.read().strip()
            if raw != "max":
                val = int(raw)
                # v1 reports a huge sentinel (~2^63) when unlimited
                if val < 1 << 60:
                    candidates.append(val)
        except (OSError, ValueError):
            pass
    return min(candidates) if candidates else None


def _default_driver_mem() -> str:
    """Half of available RAM (host ∧ cgroup limit), clamped to
    [4g, 64g] — in local mode the driver JVM is the whole cluster, but
    a fixed large -Xmx would fail on small/cgroup-limited hosts."""
    avail = _available_mem_bytes()
    if avail is None:
        return "8g"
    gb = avail // (1024 ** 3)
    return f"{max(4, min(64, gb // 2))}g"


def get_spark(
    app_name: str = "gaia_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a tuned local session.

    ``cpus`` accepts an int or "*"; defaults to $SPARK_GRAFT_CPUS or all
    cores.  On a real cluster the same conf ships via spark-submit and
    ``master`` is simply not set here.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    sp = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS",
                       DEFAULT_SHUFFLE_PARTITIONS)
    )
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                               _default_driver_mem()))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
