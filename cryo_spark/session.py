"""SparkSession construction tuned for this engine.

Local testing runs ``local[N]``; the configs below are chosen so the
same logical plans survive a 1000-executor / 100 TB deployment:

- AQE on (runtime coalescing + skew-join splitting),
- auto broadcast threshold left at default but joins against small
  dimension tables are explicitly ``broadcast()``-ed in operator code,
- shuffle partitions sized for the local test harness; at cluster
  scale AQE coalesces or the deployer overrides
  ``spark.sql.shuffle.partitions``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "cryo_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Any already-active session is reused (tests and the driver harness
    own the session lifecycle).
    """
    # py4j reflection memo (py4jopt): installed here — the engine's
    # own session entry point — instead of at package import (r18,
    # ADVICE r17: importing a library must not patch py4j for the
    # whole process). Idempotent; kill-switch SPARK_GRAFT_PY4J_MEMO=0.
    from cryo_spark import py4jopt

    py4jopt.install()

    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    n_cpus = str(os.cpu_count() or 8) if cpus == "*" else cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's coalescer merges shuffle partitions below this size.
        # The 1 MB default assumes cost ~ bytes; several operators
        # here (posting-list pair explode, count_distinct partials,
        # set-intersection verifies) are CPU-dense on byte-light rows,
        # and at the default the whole stage folds to ONE task
        # (measured: ngram_jaccard 5.1s -> 2.9s at sf0.1 with 64 KB).
        # At cluster scale real partitions dwarf either threshold, so
        # this only affects the small-intermediate regime it targets.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_MIN_PARTITION", "65536"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE inside cached plans (round 18, guide §2.2/§1.2 step 3):
        # Spark keeps AQE partition coalescing OFF under an
        # InMemoryRelation unless this flag is set, to preserve the
        # cache's output partitioning for reuse. This engine persists
        # many byte-light intermediates (funnel stage boundaries,
        # candidate-pair lists), and with the flag off every cached
        # subtree materializes at the full spark.sql.shuffle.partitions
        # width regardless of size — profiled at sf0.1 as 32-task
        # near-empty waves, run >> cpu (e.g. 1.7 s summed run / 85 ms
        # cpu). With the flag on those stages coalesce like any other
        # AQE stage. No operator here relies on a cache's output
        # partitioning (boundaries re-shuffle on their own keys
        # downstream), and results are partitioning-independent.
        # Interleaved fresh-process A/B (min-of-3 per arm, 5 queries):
        # totals 11.82 -> 10.60 and 10.59 -> 10.02; minhash (persisted
        # verify pairs) 1.85 -> 1.41 and 1.64 -> 1.22.
        # SPARK_GRAFT_CACHED_AQE=false restores stock.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            os.environ.get("SPARK_GRAFT_CACHED_AQE", "true"),
        )
        # Shuffle writer selection (round 17, guide §2.1): the
        # bypass-merge writer fires only when a shuffle has <=
        # bypassMergeThreshold partitions (stock 200) and no map-side
        # combine, and it writes R per-reducer files per map task then
        # CONCATENATES them — O(M x R) file creates + a copy pass.
        # Thread dumps of the run>>cpu stages showed exactly that
        # (DiskBlockObjectWriter.initialize / copyFileStreamNIO);
        # forcing the sort writer (ONE file per map task) cut the
        # shuffle-heavy bench queries 20-25% in interleaved A/B
        # (minhash 2.17->1.76s, ngram_stats 1.54->0.89s, full 5-query
        # sum 7.03->5.26s; wins every adjacent pair). Scale-safe by
        # construction: large shuffles exceed 200 partitions and never
        # used the bypass path — this only changes the small-shuffle
        # regime, where O(M) file ops strictly beat O(M x R) on any
        # storage. SPARK_GRAFT_BYPASS_MERGE=200 restores stock.
        .config(
            "spark.shuffle.sort.bypassMergeThreshold",
            os.environ.get("SPARK_GRAFT_BYPASS_MERGE", "1"),
        )
        # split small test files across cores (scans of row-grouped
        # files parallelize; no-op for many-file production layouts)
        .config("spark.sql.files.minPartitionNum", n_cpus)
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST", "65536"),
        )
        # Arrow for pandas UDF / toPandas boundaries (the only Python
        # hot paths we allow: keccak, u256 decimal strings, ABI decode).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # PySpark 4's DataFrame-debugging origin capture wraps EVERY
        # DataFrame/Column API call with a Python stack walk plus 3
        # extra py4j round trips (conf read + PySparkCurrentOrigin
        # set/clear). Construction-heavy plans pay seconds of pure
        # driver latency for call-site strings in error messages:
        # measured on the round-17 funnel build, 10,765 -> 6,153 py4j
        # round trips (-43%) with the capture off. Driver-side cost at
        # ANY cluster scale (plans are built on one machine), so off
        # by default; re-enable for interactive debugging via
        # SPARK_GRAFT_DF_DEBUG=true.
        .config(
            "spark.python.sql.dataFrameDebugging.enabled",
            os.environ.get("SPARK_GRAFT_DF_DEBUG", "false"),
        )
        # Generated-class cache (round 18, guide §7.3's "janino
        # codegen compiles for fresh plan segments" census item): the
        # stock 100-entry CodeGenerator cache is smaller than ONE
        # corpus_funnel pass (60+ stages, several generated classes
        # each), so every repetition re-compiled every class — visible
        # as ~40-80 ms of first-task-wave non-CPU time per stage.
        # Interleaved fresh-process A/B at 5000 entries: corpus_funnel
        # 4.91 -> 3.08 and 4.87 -> 3.38 min-of-3; 5-query totals
        # 9.93 -> 7.74 and 9.91 -> 8.36. Scale-neutral: a per-JVM
        # bounded cache of compiled classes — production drivers and
        # executors run many more distinct plan shapes than 100, not
        # fewer. SPARK_GRAFT_CODEGEN_CACHE restores any value.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "5000"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # Python workers: stamp-checked zipimporter.invalidate_caches (see
    # cryo_spark/workerdaemon.py). pyspark calls
    # importlib.invalidate_caches() at the START OF EVERY TASK, and on
    # CPython 3.11 each of the worker's ~16 zip-prefix importers eagerly
    # re-parses its archive's central directory: measured 0.3-0.8 s of
    # run time per Python task with near-zero CPU, on every
    # pandas-UDF/mapInArrow stage. The shim re-reads only when the
    # archive's (mtime_ns, size) moved — same freshness contract,
    # stat() cost. Worker-side and per-task, so it matters MORE on a
    # large cluster (millions of Python tasks), not less; the package
    # just needs to be importable where workers fork (true here and in
    # any --py-files/image deployment). SPARK_GRAFT_WORKER_DAEMON=0
    # restores the stock daemon.
    if os.environ.get("SPARK_GRAFT_WORKER_DAEMON", "1") != "0":
        pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        worker_pp = os.pathsep.join(
            p for p in (pkg_parent, os.environ.get("PYTHONPATH", "")) if p
        )
        builder = (
            builder.config("spark.python.daemon.module", "cryo_spark.workerdaemon")
            .config("spark.executorEnv.PYTHONPATH", worker_pp)
        )
        # GC pacing default is MASTER-GATED as of r18: the r17
        # gen-1-between-tasks policy (full collect every 10th task)
        # won its A/Bs on single-JVM local[N], but on a multi-executor
        # master it LOST 3/3 interleaved min-of-3 pairs on
        # local-cluster[2,4,2048] (gen1 vs stock totals: 8.81 vs
        # 7.93, 7.31 vs 6.59, 7.22 vs 7.00 — OPTIMIZATION_r18.md) —
        # with several python workers per executor the deferred full
        # collects cost more in allocation pressure than the skipped
        # pauses save. Stock cadence (=1) is therefore the default off
        # local[*]; an explicit SPARK_GRAFT_FULL_GC_EVERY always wins.
        if "SPARK_GRAFT_FULL_GC_EVERY" not in os.environ:
            is_local = (master or f"local[{cpus}]").startswith("local[")
            builder = builder.config(
                "spark.executorEnv.SPARK_GRAFT_FULL_GC_EVERY",
                "10" if is_local else "1",
            )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
