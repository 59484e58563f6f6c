"""SparkSession factory with scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "onnxtr_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    master: str | None = None,
) -> SparkSession:
    """Local session mirroring the cluster config we'd ship with spark-submit.

    - AQE on: runtime coalescing of the small final assembly shuffle and
      skew-join splitting.
    - Arrow batches capped small: detect/recognize rows carry ~1 MB of
      page bytes each, so the default 10k-record batches would OOM the
      Python workers (SURVEY.md §7 crop-join memory note).
    - Python worker reuse: model sessions are per-worker singletons;
      reuse amortizes warm-up (reference caches its ONNX session the same
      way, models/engine.py:102-112).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(32, cpus)
    # Under spark-submit the master arrives via the submitted conf
    # (spark.master); code must NOT override it, or `spark-submit
    # --master <cluster>` silently runs local[32] on the driver — the
    # deployment shape the north rule names would never engage. Only
    # set a master when neither the caller nor spark-submit chose one.
    submitted = None
    if master is None:
        from pyspark import SparkConf

        submitted = SparkConf().get("spark.master", None)
    builder = SparkSession.builder.appName(app_name)
    if submitted is None:
        builder = builder.master(master or f"local[{cpus}]")
    effective_master = submitted or master or f"local[{cpus}]"
    if effective_master.startswith("local"):
        # One box: locality waits only idle task slots between shuffle
        # stages (up to 3 s per level waiting for a PROCESS_LOCAL slot
        # that confers no benefit when every executor shares the same
        # RAM). Measured ~5% on the 4x8 local-cluster OCR job. A real
        # cluster keeps the default — rack/node locality is load-bearing
        # for 100 TB scans there.
        builder = builder.config("spark.locality.wait", "0")
    if master and master.startswith("local-cluster"):
        # the bracket arg is WORKER capacity; executors still launch at
        # the 1g default unless spark.executor.memory is set explicitly
        # default executor memory to the bracket's worker capacity (an
        # executor asking for more than its worker is unschedulable)
        cap_mb = master.rstrip("]").split(",")[-1].strip()
        default_mem = f"{cap_mb}m" if cap_mb.isdigit() else "8g"
        builder = builder.config(
            "spark.executor.memory", os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", default_mem)
        )
        # executor python workers are fresh processes: module-level
        # mapInPandas functions pickle BY REFERENCE, so the package
        # must be importable there (local[*] shares the driver process
        # and hides this)
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        builder = builder.config("spark.executorEnv.PYTHONPATH", repo_root)
    return (
        builder
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # 32 MB splits: media blobs are ~30 KB compressed rows — smaller
        # splits keep blob-heavy scans parallel across all cores without
        # a repartition (the blob side must never shuffle).
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .getOrCreate()
    )
