"""WebGetter / Neo4jWriter analogs (SURVEY.md §2.1 rows 10, 18):
politeness + caps + quarantine semantics of the fetch path, and the
neo4j-admin bulk layout + edge semantics of the graph sink."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _urls(spark, rows):
    return spark.createDataFrame([(u,) for u in rows], "url string")


def test_fetch_batches_politeness_per_host():
    """With a fake clock, consecutive fetches to one host sleep ~delay;
    distinct hosts never wait on each other (the per-host dict). Tested on
    the extracted per-task loop — injected clock/sleeper run inside the
    Python worker in the Spark path, invisible to the driver."""
    import pandas as pd

    from elasticsearch_eslib_spark.sources.webgetter import (
        _fetch_batches, _fetch_fake,
    )

    urls = [f"http://a.example/{i}" for i in range(4)] + \
           [f"http://b.example/{i}" for i in range(3)]
    pdf = pd.DataFrame({"url": urls,
                        "host": [u.split("/")[2] for u in urls]})
    t = [0.0]
    sleeps = []

    def clock():
        t[0] += 0.001
        return t[0]

    out = list(_fetch_batches(iter([pdf]), _fetch_fake, 1 << 20,
                              5.0, clock, sleeps.append))
    assert sum(len(p) for p in out) == 7
    # one sleep per same-host successor: (4-1) + (3-1) = 5, each ~5 s
    assert len(sleeps) == 5
    assert all(4.9 < s <= 5.0 for s in sleeps)


def test_fetch_pages_spark_path_no_delay(spark):
    """The Spark mapInPandas path with the default fake — politeness off
    (delay 0) never calls the sleeper."""
    from elasticsearch_eslib_spark.sources.webgetter import fetch_pages

    urls = [f"http://a.example/{i}" for i in range(4)] + \
           [f"http://b.example/{i}" for i in range(3)]
    rows = fetch_pages(_urls(spark, urls), n_partitions=2).collect()
    assert len(rows) == 7
    assert all(r["status"] == 200 for r in rows)


def test_fetch_pages_host_isolation(spark):
    """Every host's urls land in exactly one partition (the property that
    makes the per-task politeness clock globally correct)."""
    from elasticsearch_eslib_spark.sources.webgetter import _HOST_RE

    urls = [f"http://h{i % 11}.example/p/{i}" for i in range(200)]
    routed = (_urls(spark, urls)
              .select("url", F.regexp_extract("url", _HOST_RE, 1).alias("host"))
              .repartition(7, "host"))
    per_host = (routed.withColumn("pid", F.spark_partition_id())
                .groupBy("host").agg(F.countDistinct("pid").alias("n"))
                .collect())
    assert per_host and all(r["n"] == 1 for r in per_host)


def test_fetch_pages_size_cap_and_quarantine(spark):
    from elasticsearch_eslib_spark.sources.webgetter import (
        STATUS_FETCH_ERROR, fetch_pages,
    )

    def fetcher(url):
        if url.endswith("/boom"):
            raise ConnectionError("refused")
        return 200, b"x" * 1000

    urls = ["http://c.example/ok1", "http://c.example/boom",
            "http://d.example/ok2"]
    rows = {r["url"]: r for r in fetch_pages(
        _urls(spark, urls), fetcher=fetcher, max_bytes=64).collect()}
    assert rows["http://c.example/ok1"]["n_bytes"] == 64
    assert rows["http://c.example/ok1"]["html"] == b"x" * 64
    boom = rows["http://c.example/boom"]
    assert boom["status"] == STATUS_FETCH_ERROR
    assert boom["html"] is None and boom["n_bytes"] == 0
    assert rows["http://d.example/ok2"]["status"] == 200


def test_fetch_pages_fake_matches_sql_twin(spark):
    """The offline fake is exactly its documented SQL expression — the
    property the driver oracle relies on."""
    from elasticsearch_eslib_spark.sources.webgetter import fetch_pages

    urls = ["http://e.example/1", "http://f.example/22"]
    rows = {r["url"]: r for r in
            fetch_pages(_urls(spark, urls)).collect()}
    for u in urls:
        body = f"<html><body>fetched:{u}</body></html>".encode()
        assert rows[u]["html"] == body
        assert rows[u]["n_bytes"] == len(body)
        assert rows[u]["host"] == u.split("//")[1].split("/")[0]


def test_interaction_edges_match_duckdb(spark):
    from elasticsearch_eslib_spark.sources.graphsink import interaction_edges

    got = sorted(
        tuple(r) for r in interaction_edges(spark, SF)
        .select("src_user", "dst_item", "rel_type", "weight", "total_cents")
        .collect())
    want = sorted(tuple(r) for r in duckdb.sql(rf"""
        SELECT user_id, CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT),
               event_type, count(*)::BIGINT,
               sum(CAST(round(value * 100) AS BIGINT))::BIGINT
        FROM '{SF}/events.parquet' GROUP BY 1, 2, 3""").fetchall())
    assert got == want


def test_neo4j_bulk_layout_round_trips(spark, tmp_path):
    """The sink writes the neo4j-admin import tree: per-entity header file
    + headerless distributed parts, and the parts read back to exactly the
    edge frame."""
    from elasticsearch_eslib_spark.sources.graphsink import (
        interaction_edges, write_neo4j_bulk,
    )

    edges = interaction_edges(spark, SF)
    out = str(tmp_path / "graph")
    stats = write_neo4j_bulk(edges, out)

    hdr = open(os.path.join(out, "rels", "_header.csv")).read().strip()
    assert hdr == (":START_ID(User),:END_ID(Item),:TYPE,"
                   "weight:long,totalCents:long")
    assert open(os.path.join(out, "nodes_user", "_header.csv")).read() \
        .startswith("userId:ID(User)")

    con = duckdb.connect()
    back = con.sql(f"""
        SELECT * FROM read_csv('{out}/rels/part-*.csv', header=false,
          columns={{'src': 'BIGINT', 'dst': 'BIGINT', 'typ': 'VARCHAR',
                    'w': 'BIGINT', 'cents': 'BIGINT'}})""").fetchall()
    want = sorted(tuple(r) for r in edges.collect())
    assert sorted(back) == want
    assert stats["n_rels"] == len(want)
    assert stats["n_users"] == len({r[0] for r in want})
    assert stats["n_items"] == len({r[1] for r in want})


def test_neo4j_bulk_single_execution_per_frame(spark, tmp_path):
    """The sink's counts ride the CSV writes (df.observe) — exactly one
    Spark job per output frame, never a second count() action re-running
    the distinct/groupBy lineage (at 100 TB that doubled the sink)."""
    from elasticsearch_eslib_spark.sources.graphsink import (
        interaction_edges, write_neo4j_bulk,
    )

    edges = interaction_edges(spark, SF)
    sc = spark.sparkContext
    sc.setJobGroup("neo4j-sink-jobcount", "graph sink job audit")
    try:
        stats = write_neo4j_bulk(edges, str(tmp_path / "graph"))
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("neo4j-sink-jobcount")
    # AQE runs each write query as ≤2 jobs (one per materialized shuffle
    # stage + the write). The old double-compute shape added ≥1 more job
    # per frame for the .count() actions (≥9 total) — cap at write-only.
    assert len(jobs) <= 6, f"expected ≤6 write-only jobs, saw {len(jobs)}"
    assert stats["n_rels"] > 0 and stats["n_users"] > 0


def test_graph_sink_batch_epochs(spark, tmp_path):
    from elasticsearch_eslib_spark.sources.graphsink import (
        graph_sink_batch, interaction_edges,
    )

    edges = interaction_edges(spark, SF)
    out = str(tmp_path / "inc")
    graph_sink_batch(edges.limit(10), 0, out)
    graph_sink_batch(edges.limit(5), 1, out)
    n0 = duckdb.sql(
        f"SELECT count(*) FROM read_csv('{out}/rels/epoch=0/part-*.csv', "
        f"header=false, all_varchar=true)").fetchone()[0]
    n1 = duckdb.sql(
        f"SELECT count(*) FROM read_csv('{out}/rels/epoch=1/part-*.csv', "
        f"header=false, all_varchar=true)").fetchone()[0]
    assert (n0, n1) == (10, 5)
