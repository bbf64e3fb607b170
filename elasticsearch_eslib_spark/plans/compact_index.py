"""Index compaction ("force merge"): rewrite a multi-epoch index into a
fresh single-epoch index directory.

Appends (plans/append_index.py) deliberately never rewrite committed
blocks, so over many epochs an index accumulates (a) per-term block
fragmentation — every epoch ends each term with a partial tail block —
and (b) WAND-bound looseness, because bounds are derived with the
avgdl-drift factor max(1, avgdl_now / bound_avgdl). Compaction restores
the cold-build state:

  decode every block (lossless codec) → (term_id, doc_id, tf, dl)
  → re-salt / re-sort / re-encode (the build's own encode_enriched)
  → full 128-doc blocks per (term, salt-run), raw bounds under the
    CURRENT avgdl → bound_avgdl == avg_dl (drift factor back to 1)

The output is a NEW index directory (docs/terms consolidated, stats
re-stamped, fresh manifest) — immutable-snapshot style: the caller flips
its pointer/symlink to the compacted dir, which is the only atomic swap
primitive that works on every store (and exactly how an Iceberg catalog
pointer swap behaves). doc_ids and term_ids are PRESERVED, so query
results before and after compaction are identical (tested), and future
appends continue on the compacted dir from epoch 1.

Scale: one decode+encode pass over the postings — the same cost profile
as the build's S4, shuffle sized by data volume; at 10^12 docs this runs
as an occasional maintenance job, never on the serve path.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession, functions as F

from elasticsearch_eslib_spark.config import HEAD_DF_THRESHOLD, N_SALTS
from elasticsearch_eslib_spark.operators.build import encode_enriched
from elasticsearch_eslib_spark.operators.query import (
    N_POSTING_BUCKETS, decode_blocks,
)
from elasticsearch_eslib_spark.plans.build_index import Index, committed_epochs
from elasticsearch_eslib_spark.sources.tableio import open_tableio


class CompactionConflict(RuntimeError):
    """An append committed to the source index while compaction ran; the
    compacted output would silently drop that epoch — abort uncommitted."""


def _index_state(spark: SparkSession, src_dir: str) -> tuple:
    """Identity of the source index's committed content: the base postings
    snapshot plus every committed epoch's stats snapshot. Metadata only —
    re-derived from a FRESH TableIO so a concurrent writer's manifest
    replace is observed."""
    io = open_tableio(spark, src_dir)
    epochs = committed_epochs(io)
    return (io.stage_snapshot("postings"),
            tuple((e, io.stage_snapshot(f"stats_a{e}")) for e in epochs))


def compact_index(spark: SparkSession, src_dir: str, dst_dir: str,
                  pre_commit_hook=None) -> dict:
    """Compact `src_dir` (any number of epochs) into fresh `dst_dir`.

    Single-writer by convention, VERIFIED at the commit point: the source
    snapshot state captured at start is re-checked before the final commit
    (and the caller should check again before flipping its pointer) — if an
    append landed mid-compaction, CompactionConflict aborts with dst_dir
    uncommitted (no postings stage → unreadable as an index), so a stale
    compact can never shadow committed epochs. `pre_commit_hook` is a test
    seam injected between the rewrite and the conflict check."""
    t0 = time.time()
    state0 = _index_state(spark, src_dir)
    idx = Index(spark, src_dir)
    n_docs, avg_dl = idx.n_docs, idx.avg_dl
    src_epochs = committed_epochs(idx.io)
    meta_stage = f"stats_a{src_epochs[-1]}" if src_epochs else "postings"
    # a compaction is a corpus pass anyway, so the legacy (no-metric)
    # fallback agg costs nothing relative to the job
    max_doc_id = int(
        idx.io.stage_metrics(meta_stage).get("max_doc_id")
        or idx.docs.agg(F.max("doc_id")).collect()[0][0] or 0)

    out = open_tableio(spark, dst_dir)
    fp = "compact:" + idx.io.stage_snapshot("postings")

    # re-enrich from decoded blocks: dl rides inside the blocks, df comes
    # from the (vocab-sized, broadcast) terms table for head-term salting
    salt_width = max(1, (n_docs + N_SALTS - 1) // N_SALTS)
    dec = decode_blocks(idx.postings)
    enriched = (dec.join(F.broadcast(idx.terms.select("term_id", "df")),
                         "term_id")
                .select("term_id", "doc_id",
                        F.col("tf").cast("int").alias("tf"),
                        F.col("dl").cast("int").alias("dl"),
                        F.when(F.col("df") > HEAD_DF_THRESHOLD,
                               (F.col("doc_id") / salt_width).cast("int"))
                        .otherwise(F.lit(0)).alias("salt")))
    posts = encode_enriched(enriched, n_docs, avg_dl)

    out.write_table("docs", idx.docs)
    out.commit_stage("docs_tf", "docs", None, fp,
                     metrics={"n_docs": n_docs, "avg_dl": avg_dl})
    out.write_table("terms", idx.terms)
    out.commit_stage("terms", "terms", None, fp)
    out.write_table(
        "postings",
        posts.withColumn(
            "p_bucket",
            F.pmod(F.col("term_id"), F.lit(N_POSTING_BUCKETS)).cast("int"))
        .repartition(N_POSTING_BUCKETS, "p_bucket"),
        partition_by=["p_bucket"])

    # per-term block counts for future appends onto the compacted dir
    out.write_table("block_offs", out.read("postings")
                    .groupBy("term_id")
                    .agg((F.max("block_id") + 1).cast("int")
                         .alias("n_blocks")))

    import datetime as _dt
    import uuid as _uuid

    if pre_commit_hook is not None:
        pre_commit_hook()
    if _index_state(spark, src_dir) != state0:
        raise CompactionConflict(
            f"source index {src_dir} changed during compaction "
            "(append committed mid-run); rerun compaction")

    snapshot = _uuid.uuid4().hex[:26]
    # bound_avgdl == avg_dl again: every block re-encoded under the
    # current stats — the WAND drift factor is exactly 1 post-compaction
    out.write_table("stats", spark.createDataFrame(
        [(n_docs, avg_dl, avg_dl,
          _dt.datetime.now(_dt.timezone.utc), snapshot)],
        "n_docs long, avg_dl double, bound_avgdl double, "
        "built_at timestamp, snapshot string"))
    out.commit_stage("postings", "postings", None, fp, snapshot=snapshot,
                     metrics={"n_docs": n_docs, "avg_dl": avg_dl,
                              "max_doc_id": max_doc_id,
                              "compacted_from": src_dir})
    return {"n_docs": n_docs, "avg_dl": avg_dl,
            "wall_sec": time.time() - t0}
