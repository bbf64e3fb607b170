"""E3/E5 — deterministic dense ID assignment at scale (SURVEY.md §7 hard part a).

Gives every row a dense 1-based long id ordered by a key column, without
`zipWithIndex` (RDD) and without a single-partition global window:

  pass 0: range-repartition by key, sort within partitions, persist
          (persisting pins the sampled range boundaries so both passes see
          the identical partitioning);
  pass 1: count rows per physical partition (tiny collect: P longs);
  pass 2: mapInPandas adds offset[pid] + within-partition row number.

Determinism: keys are unique, ranges are ordered, partitions are sorted →
global order == key order regardless of where the sampled boundaries fell,
so ids are reproducible across runs and parallelism levels (needed for the
rank-identical invariant, BASELINE.json north_rule, and the scaling bench).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


def assign_dense_ids(df: DataFrame, key_col: str, id_col: str,
                     num_partitions: int | None = None,
                     sum_cols: list[str] | None = None,
                     persist_input: bool = True) -> DataFrame:
    """Return ``df`` + ``id_col``: dense 1-based longs in ``key_col`` order.

    ``sum_cols``: piggy-back global sums onto the counting pass (e.g.
    Σ doc_len and the indexable-doc count for avg_dl) — exposed as
    ``result._dense_ids_sums`` so callers skip extra aggregation jobs.

    ``persist_input=False``: skip the input cache when the child plan is
    a trivial projection of a committed table (S2's doc_meta) — the
    sampling pass then re-scans the parquet instead of materializing a
    cache that costs more than the rescan (guide rule: cache only when
    recompute > cache cost). Ids are unchanged either way: global order
    == key order regardless of where the sampled boundaries fall."""
    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # repartitionByRange runs a SAMPLING job that executes the child plan
    # before the real shuffle does — for an expensive child (S3's vocab is
    # a full groupBy over the exploded tf stream) that doubles the stage.
    # Persisting the input first makes the sampling pass materialize the
    # cache and the shuffle read it back: the child computes exactly once.
    src = df.persist(StorageLevel.MEMORY_AND_DISK) if persist_input else df
    part = (
        src.repartitionByRange(n_part, F.col(key_col))
        .sortWithinPartitions(key_col)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sum_cols = sum_cols or []
    aggs = [F.count("*").alias("cnt")] + [
        F.sum(c).alias(f"sm_{c}") for c in sum_cols]
    rows = part.groupBy("__pid").agg(*aggs).collect()
    counts = {r["__pid"]: r["cnt"] for r in rows}
    total_sums = {c: sum(r[f"sm_{c}"] or 0 for r in rows) for c in sum_cols}
    offsets: dict[int, int] = {}
    running = 0
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]

    from pyspark.sql import types as T

    cols = [f.name for f in df.schema.fields]
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(id_col, T.LongType(), False)])

    def _assign(iterator):
        seen = 0
        base = None
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["__pid"].iloc[0])]
            out = pdf[cols].copy()
            out[id_col] = base + seen + 1 + np.arange(len(pdf))
            seen += len(pdf)
            yield out

    # the range-partitioned cache supersedes the input cache from here on
    if persist_input:
        src.unpersist()
    result = part.mapInPandas(_assign, schema=out_schema)
    # Note: `part` stays persisted until the caller materializes `result`;
    # callers that checkpoint the stage may call unpersist_ids() after.
    result._dense_ids_cache = part  # noqa: SLF001 — handle for unpersist
    result._dense_ids_total = running  # noqa: SLF001 — row count, free
    result._dense_ids_sums = total_sums  # noqa: SLF001 — Σ per sum_col, free
    return result


def unpersist_ids(df: DataFrame) -> None:
    cache = getattr(df, "_dense_ids_cache", None)
    if cache is not None:
        cache.unpersist()
