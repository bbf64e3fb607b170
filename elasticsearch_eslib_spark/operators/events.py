"""Event-stream analytics over the `events` table — the batch twins of the
reference's unbounded sources (TwitterMonitor/RabbitmqMonitor/Timer,
SURVEY.md §2.1 rows 11–17). The streaming (readStream) versions live in
streaming/ingest.py; these batch formulations are the DuckDB-checkable
semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate: (window_start, event_type, n,
    total) — the batch twin of the streaming windowed count."""
    ev = load_events(spark, sf_dir)
    # value summed as exact integer cents: float-summation order differs
    # between engines, integer sums are order-independent → oracle-exact
    return (ev.groupBy(
        F.window("ts", "1 hour").getField("start").alias("window_start"),
        "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.round(F.col("value") * 100).cast("long"))
              .alias("total_cents")))


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min gap): (user_id, n_sessions, n_events) —
    lag + cumulative-sum-over-gap window pattern."""
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ in the parquet → epoch seconds via a tz-pinned
    # double cast (session tz is UTC; matches DuckDB's naive epoch())
    epoch = F.col("ts").cast("timestamp").cast("long")
    gapped = ev.withColumn(
        "new_sess",
        F.when(epoch - F.lag(epoch).over(w) > 1800, 1)
         .when(F.lag("ts").over(w).isNull(), 1)
         .otherwise(0))
    return (gapped.groupBy("user_id")
            .agg(F.sum("new_sess").alias("n_sessions"),
                 F.count("*").alias("n_events")))
