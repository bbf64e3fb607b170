"""Neo4jWriter analog — graph-edge extraction + bulk-import sink
(SURVEY.md §2.1 row 18; reference `eslib/procs/Neo4jWriter.py` +
`eslib/neo4j.py`, recalled semantics: write nodes/relationships for a
user-interaction graph to a graph store).

Offline sandbox: no Neo4j server or driver exists here, and a Bolt
round-trip per row would be the anti-pattern at 100 TB anyway. The
Spark-first sink is the **neo4j-admin bulk import layout** — Neo4j's own
documented path for billion-edge ingest: one small `_header.csv` per
entity plus headerless CSV part files, passed to the importer as
`--nodes=header.csv,part-*.csv --relationships=...`. That layout is a
perfect match for a distributed writer (each task streams one part file;
no single-file collapse, no driver funnel), and it is fully testable
offline by reading the directories back.

100 TB design notes:
  * Node frames are `select(...).distinct()` — one hash shuffle on the
    node key, map-side partial agg collapses duplicates first.
  * The relationship frame is a groupBy on (src, dst, type) — same
    single-shuffle shape; weights aggregate map-side.
  * Writers keep Spark's task-level parallelism (no `.coalesce(1)`);
    the tiny header file is the only driver-written artifact.
  * The streaming edge (`graph_sink_batch`) is the `foreachBatch`
    target: each micro-batch appends part files into an epoch subdir,
    so the importer (or an incremental LOAD CSV) consumes per-epoch
    deltas — the same epoch pattern the index append path uses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .readers import read_csv_docs  # noqa: F401  (re-export convenience)

#: props is a JSON blob `{"k": <int>}`; extracted by regex so the Spark
#: plan and the DuckDB oracle share one literal pattern (no dependence on
#: matching JSON-function semantics across engines).
_ITEM_RE = r'"k":\s*(\d+)'


def interaction_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → weighted bipartite interaction graph
    (src_user, dst_item, rel_type, weight, total_cents).

    The reference's Neo4j use case was a user/relation graph built from a
    social stream; the engine analog derives user→item edges from the
    `events` table: one edge per (user, item-in-props, event_type) with
    an interaction count and an exact integer value sum (float sums are
    order-dependent across engines; cents are oracle-exact).
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.select(
                F.col("user_id").alias("src_user"),
                F.regexp_extract("props", _ITEM_RE, 1).cast("long")
                 .alias("dst_item"),
                F.col("event_type").alias("rel_type"),
                F.col("value"))
            .groupBy("src_user", "dst_item", "rel_type")
            .agg(F.count("*").alias("weight"),
                 F.sum(F.round(F.col("value") * 100).cast("long"))
                  .alias("total_cents")))


def _write_with_header(df: DataFrame, out_dir: str, header: str) -> None:
    """Headerless distributed CSV parts + one driver-written header file —
    the `neo4j-admin database import --nodes=<header>,<parts>` layout."""
    df.write.mode("overwrite").option("header", "false").csv(out_dir)
    with open(os.path.join(out_dir, "_header.csv"), "w") as fh:
        fh.write(header + "\n")


def write_neo4j_bulk(edges: DataFrame, out_dir: str) -> dict:
    """Write a (src_user, dst_item, rel_type, weight, total_cents) edge
    frame as a neo4j-admin bulk-import tree:

        out_dir/nodes_user/   _header.csv + part-*.csv   (:User nodes)
        out_dir/nodes_item/   _header.csv + part-*.csv   (:Item nodes)
        out_dir/rels/         _header.csv + part-*.csv   (INTERACTED rels)

    Returns the node/edge counts (the sink's metrics row, mirroring the
    reference writer's emitted stats).
    """
    # ONE execution per frame: the counts ride the CSV writes via
    # df.observe() instead of a second .count() action per output — the
    # old shape re-ran every distinct/groupBy lineage twice (6 plan
    # executions for 3 outputs), which at 100 TB doubles the sink's cost.
    from pyspark.sql import Observation

    obs_u, obs_i, obs_r = Observation(), Observation(), Observation()
    users = (edges.select(F.col("src_user").alias("id")).distinct()
             .observe(obs_u, F.count(F.lit(1)).alias("n")))
    items = (edges.select(F.col("dst_item").alias("id")).distinct()
             .observe(obs_i, F.count(F.lit(1)).alias("n")))
    rels = (edges.select("src_user", "dst_item", "rel_type",
                         "weight", "total_cents")
            .observe(obs_r, F.count(F.lit(1)).alias("n")))
    _write_with_header(users, os.path.join(out_dir, "nodes_user"),
                       "userId:ID(User)")
    _write_with_header(items, os.path.join(out_dir, "nodes_item"),
                       "itemId:ID(Item)")
    _write_with_header(
        rels, os.path.join(out_dir, "rels"),
        ":START_ID(User),:END_ID(Item),:TYPE,weight:long,totalCents:long")
    return {"n_users": int(obs_u.get["n"]), "n_items": int(obs_i.get["n"]),
            "n_rels": int(obs_r.get["n"])}


def graph_sink_batch(batch: DataFrame, batch_id: int, out_dir: str) -> None:
    """`foreachBatch` target: per-epoch edge deltas for incremental graph
    load. Each micro-batch's edges land in `rels/epoch=<id>/` (headerless
    parts; the static header from `write_neo4j_bulk` applies)."""
    (batch.write.mode("overwrite").option("header", "false")
     .csv(os.path.join(out_dir, "rels", f"epoch={batch_id}")))
