"""SparkSession factory tuned for the engine.

Scale posture: AQE on (runtime shuffle-partition coalescing, skew-join
splitting, dynamic broadcast conversion), non-ANSI casts to match the
reference's lenient ``float()``-with-except semantics (reference
con.py:39-43, app.py:124-125), Arrow for any pandas boundary crossing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "student-progress-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Local test harness defaults; on a real cluster the same config knobs
    apply — only ``master`` and memory sizing change.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(max(2 * cpus, 8)))
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime re-planning — coalesce small shuffle partitions,
        # convert to broadcast joins when runtime stats allow, split skew.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalescePartitions.parallelismFirst stays at its default
        # (true): the r14 A/B of false (respect the 64 MB advisory, the
        # tuning guide's cluster recommendation) collapsed every small
        # post-shuffle stage to ONE task and cost the bench ~1-4% —
        # storage commits lost their write parallelism (30 sequential
        # files beat 60 parallel ones nowhere) and small-shuffle engine
        # stages serialized.  Revisit only with profiling on a real
        # cluster, where task overhead vs parallelism trades differently.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Lenient casts (NULL on failure) to match reference semantics.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    return builder.getOrCreate()
