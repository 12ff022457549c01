"""SparkSession factory with the scale posture baked in.

Every knob here is chosen for the 100 TB / 1000-executor target and
merely *exercised* at local[N] test scale (SURVEY.md §4.2):

- AQE on: runtime broadcast-vs-SMJ on the alias join, skew-join
  splitting for Zipf-skewed domains, small-partition coalescing.
- Arrow batches ~1k rows: keeps every worker's active set resident in
  shared LLC at full parallelism (see ARROW_BATCH_ROWS) and wide
  text/binary rows can't OOM the Python workers (SURVEY.md §4.3.4).
- UTC session timezone: deterministic timestamp semantics vs DuckDB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32

#: glibc tuning for the Python workers (and, in local mode, the whole
#: process tree): retain freed memory instead of munmap/trim-ing it
#: back to the kernel.  The pandas-UDF hot path allocates and frees
#: tens of MB per Arrow batch; with glibc defaults every batch
#: re-faults its pages, and the kernel fault path CONTENDS across
#: workers — measured on the 1M-doc tag stage: 36 core-s of sys time
#: at 4 workers vs 1170 core-s at 16 (a 32× blowup for 4× the
#: workers, ~50M minor faults/run).  Retention drops worker sys time
#: ~25× and cuts tag-stage wall ~30% at 16 cores; see
#: BENCH/SCALING.md.  Cost: higher steady-state RSS per worker
#: (bounded by the worker's own peak, which executor sizing already
#: budgets for).
WORKER_MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": "1073741824",
    "MALLOC_TRIM_THRESHOLD_": "1073741824",
    "MALLOC_TOP_PAD_": "134217728",
    "MALLOC_MMAP_MAX_": "0",
}

#: Parquet scan split target.  The KG pipeline feeds scan splits
#: straight into the fused Arrow tagger (no pre-shuffle — see
#: plans/pipeline.py), so the scan must yield enough splits for ≥2
#: task waves per core; 32 MB over a multi-GB corpus does that at any
#: local core count while staying row-group-granular (corpora are
#: written with ~2k-doc row groups).  On a real cluster this is the
#: same knob you'd size as input_bytes / (2 × total_cores).
MAX_PARTITION_BYTES = 32 * 1024 * 1024

#: Arrow batch rows for pandas UDFs.  Small enough that the ACTIVE
#: per-worker set (input batch + row staging + output frame + Arrow
#: buffers, ~6 MB at 1024 pages) keeps all workers resident in shared
#: LLC at full parallelism — measured tag-stage wall at 16 pinned
#: cores: 250 s @8192 rows → 157 s @2048 → 133 s @1024 (and python
#: user CPU down 24%), while 4-core legs are batch-insensitive (their
#: active set fits cache at any size).  Big batches amortize nothing
#: past ~1k rows; they just thrash.
ARROW_BATCH_ROWS = 1024


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
    # local mode: python workers inherit this process's environment
    for k, v in WORKER_MALLOC_ENV.items():
        os.environ.setdefault(k, v)
    arrow_batch = os.environ.get("SPARK_GRAFT_ARROW_BATCH",
                                 str(ARROW_BATCH_ROWS))
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                arrow_batch)
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES",
                               str(MAX_PARTITION_BYTES)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                               _default_driver_mem()))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # lz4 on SERIALIZED persisted blocks — pairs with
        # checkpoint.big_local_checkpoint (corpus-sized fan-in tables
        # are stored serialized and re-scanned 3-4×; measured −13 to
        # −45 s per ~100-145 s 16-core leg, neutral at 4 cores — see
        # gaia_spark/checkpoint.py and BENCH/SCALING.md).  Affects no
        # deserialized-level cache.
        .config("spark.rdd.compress", "true")
    )
    # Iceberg: no runtime jar ships in this sandbox, but if one is
    # provided (SPARK_GRAFT_ICEBERG_JAR=/path/to/
    # iceberg-spark-runtime-*.jar) the session auto-configures a
    # hadoop-type catalog and gaia_spark.catalog upgrades its writes
    # to native `writeTo(...).createOrReplace()` with spec
    # (lang, bucket(url)) — see catalog.iceberg_available.
    ice_jar = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if ice_jar and os.path.exists(ice_jar):
        b = (
            b.config("spark.jars", ice_jar)
            .config("spark.sql.extensions",
                    "org.apache.iceberg.spark.extensions."
                    "IcebergSparkSessionExtensions")
            .config("spark.sql.catalog.gaia_ice",
                    "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.gaia_ice.type", "hadoop")
            .config("spark.sql.catalog.gaia_ice.warehouse",
                    os.environ.get("SPARK_GRAFT_ICEBERG_WAREHOUSE",
                                   "/tmp/gaia_ice_warehouse"))
        )
    # cluster mode: ship the same worker malloc tuning to executors
    for k, v in WORKER_MALLOC_ENV.items():
        b = b.config(f"spark.executorEnv.{k}", v)
    # Env-injected conf (JSON dict), applied before the caller's
    # extra_conf: lets harnesses (scaling probe, bench) A/B session
    # knobs — GC flags, compression codecs — without code edits, the
    # same way spark-submit --conf would on a real cluster.
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if env_conf:
        import json
        for k, v in json.loads(env_conf).items():
            b = b.config(k, str(v))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
