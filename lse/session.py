"""SparkSession helpers for the engine and tests."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Netty 4.2 emits JFR events from its pooled allocator. The FIRST Arrow
# allocation of the app triggers the static init of those event classes,
# which loads the whole jdk.jfr runtime while every other task blocks on
# the class-initialization monitor (observed: all 32 executor threads
# parked in PooledByteBufAllocator.onAllocateChunk for 5-10 s, guide
# §7.3 thread-dump method). Nothing here consumes JFR; turn the events
# off so allocation never touches the event classes.
_DRIVER_JVM_OPTS = "-Dio.netty.jfr.enabled=false"


def get_spark(
    app_name: str = "lse",
    master: str | None = None,
    shuffle_partitions: int = 32,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "*")
    )
    # Make the repo root importable in worker/daemon subprocesses no matter
    # what the caller's cwd is: the preloading daemon module below and every
    # kernel closure pickled by reference (`from .wand import ...`) need
    # `import lse` to resolve inside the forked python workers. Must happen
    # BEFORE the JVM launches so the env propagates.
    _repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _pp = os.environ.get("PYTHONPATH", "")
    if _repo_root not in _pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _repo_root + (os.pathsep + _pp if _pp else "")
        )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # default 64m advisory folds medium shuffles into a handful of tasks,
        # capping reduce-stage parallelism well below the core count
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode: driver heap IS the executor heap. An 8g default made
        # the 32-thread build SLOWER than 8 threads at 1M+ docs (GC storm +
        # cache eviction while persisting term_doc under 32 concurrent
        # tasks); the box has 128 GiB — give the JVM room.
        .config("spark.driver.memory", os.environ.get("LSE_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # defaultJavaOptions is PREPENDED to any caller-supplied
        # extraJavaOptions, so extra_conf can still pass its own flags
        .config("spark.driver.defaultJavaOptions", _DRIVER_JVM_OPTS)
        # fork workers from a daemon that has numpy/pandas and the lse
        # kernel modules preloaded (fork COW) — otherwise each pooled
        # worker pays the ~150 ms import chain the first time it sees a
        # kernel UDF, and the FIFO idle pool makes that "first time"
        # recur for many queries (see lse/spark_daemon.py)
        .config("spark.python.daemon.module", "lse.spark_daemon")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    _warm_session(spark)
    return spark


def _warm_session(spark: SparkSession) -> None:
    """One-time per-session warm-up of the generic engine machinery.

    A fresh JVM pays first-use costs on whatever job happens to run
    first: Janino compilation of the first generated classes, JIT of the
    shuffle writer/reader and sort paths, parquet writer/committer init,
    Arrow allocator init, and — the largest single item — forking one
    Python daemon worker per core and importing numpy/pandas inside each
    (~2 s at 32 cores). Left alone, those costs land inside the first
    *real* build or query. Doing a constant amount of warm-up work at
    session creation moves them to init time, exactly like a serving
    system warming its worker pool before taking traffic. No user data
    is touched and nothing is persisted: every job here runs over a few
    dozen synthetic rows.

    Skipped when the session is already warm (getOrCreate reuse) or when
    ``LSE_SESSION_WARM=0`` (tests that count jobs / need cold sessions).
    """
    if os.environ.get("LSE_SESSION_WARM", "1") in ("0", "false", "no"):
        return
    try:
        if spark.conf.get("spark.lse.session.warmed", "0") == "1":
            return
    except Exception:
        pass
    import shutil
    import tempfile
    import threading

    from pyspark.sql import functions as F

    errors: list = []

    def _guard(fn):
        def run():
            try:
                fn()
            except Exception as e:  # warm-up is best-effort
                errors.append(e)

        return run

    def warm_python_pool():
        # fork + import the worker pool: one task per core so every
        # daemon worker in the pool comes up with numpy/pandas and the
        # tokenizer kernel hot (reused workers keep their imports)
        n = spark.sparkContext.defaultParallelism

        def f(batches):
            import pandas as _pd

            from .tokenizer import tokenize_batch as _tb

            _tb(_pd.Series(["warm up the tokenizer"]), True)
            for b in batches:
                yield b

        (
            spark.range(0, n, 1, n)
            .repartition(n)
            .mapInPandas(f, "id long")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    def warm_sql():
        # shuffle + sort + parquet write/read + hash agg + broadcast
        # join over 64 synthetic rows: first-use of the exchange, sort,
        # committer and codegen paths
        out = tempfile.mkdtemp(prefix="lse_warm_")
        try:
            df = spark.range(0, 64, 1, 4).select(
                F.col("id"),
                F.sha2(F.concat(F.lit("w"), F.col("id").cast("string")), 256).alias("s"),
                (F.col("id") % 4).alias("k"),
                # touch the collation-aware string kernels: the FIRST
                # lower()/contains() of the app initializes the ICU
                # tables (CollationAwareUTF8String <clinit>) under a
                # class-init monitor that every sibling task blocks on
                F.lower(F.conv(F.col("id").cast("string"), 10, 16)).alias("lc"),
                F.contains(F.col("id").cast("string"), F.lit("3")).alias("ct"),
            )
            (
                df.repartition(4, "k")
                .sortWithinPartitions("id")
                .write.mode("overwrite")
                .parquet(out)
            )
            back = spark.read.parquet(out)
            small = spark.range(0, 4).select(F.col("id").alias("k"))
            (
                back.join(F.broadcast(small), "k")
                .groupBy("k")
                .agg(F.count("*").alias("c"), F.sum("id").alias("t"), F.max("s"))
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
        finally:
            shutil.rmtree(out, ignore_errors=True)

    def warm_apply():
        # FlatMapGroupsInPandas (the postings-encode operator shape)
        (
            spark.range(0, 8, 1, 2)
            .select(F.col("id"), (F.col("id") % 2).alias("k"))
            .groupBy("k")
            .applyInPandas(lambda pdf: pdf, "id long, k long")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    threads = [
        threading.Thread(target=_guard(fn), daemon=True)
        for fn in (warm_python_pool, warm_sql, warm_apply)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    try:
        spark.conf.set("spark.lse.session.warmed", "1")
    except Exception:
        pass
