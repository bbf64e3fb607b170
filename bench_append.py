#!/usr/bin/env python
"""Incremental-append economics: what does an append cost vs a rebuild,
and what does compaction buy back at query time?

  1. build A (N docs)                  — baseline index
  2. append B (N docs) onto A         — the incremental path
  3. cold build A∪B (2N docs)         — what the append replaces
  4. WAND p50 on the appended (2-epoch) index vs the compacted index
     (measured back-to-back in one window; persistent-serve methodology
     of bench_query_latency.py)

Prints ONE JSON line and writes BENCH/append_bench.json. Corpus chunks
come from the deterministic fixture generator (gen_pages_range), cached
under BENCH/.fixtures/.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N = int(os.environ.get("APPEND_BENCH_DOCS", "300000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("APPEND_BENCH_REPS", "7"))


def ensure_range(lo: int, hi: int) -> str:
    out_dir = os.path.join(REPO, "BENCH", ".fixtures", f"pages_r{lo}_{hi}")
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    # chunked so the file set is splittable and generation parallelizes
    import multiprocessing as mp

    chunk = 100_000
    parts = [(a, min(a + chunk, hi)) for a in range(lo, hi, chunk)]

    todo = [(a2, b2, os.path.join(out_dir, f"part-{a2:09d}.parquet"))
            for a2, b2 in parts]
    with mp.Pool(min(8, len(parts))) as pool:
        pool.map(_gen_chunk, todo)
    open(marker, "w").close()
    return out_dir


def _gen_chunk(args) -> None:
    lo, hi, path = args
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_eslib_spark.fixtures import gen_pages_range

    schema = pa.schema([
        pa.field("url", pa.string(), False),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC"), False),
        pa.field("html", pa.binary(), False),
        pa.field("text", pa.string(), True),
        pa.field("lang", pa.string(), False),
    ])
    pq.write_table(pa.Table.from_pandas(
        gen_pages_range(lo, hi), schema=schema, preserve_index=False),
        path, row_group_size=10_000)


def serve_p50(spark, index_dir: str) -> float:
    from elasticsearch_eslib_spark.fixtures import gen_queries
    from elasticsearch_eslib_spark.operators.query import topk_wand
    from elasticsearch_eslib_spark.plans.build_index import Index

    idx = Index(spark, index_dir)
    idx.terms = idx.terms.persist()
    idx.terms.count()
    qdf = spark.createDataFrame(gen_queries())
    n_q = qdf.count()
    run = lambda: topk_wand(  # noqa: E731
        qdf, idx.terms, idx.postings, idx.n_docs, idx.avg_dl,
        bound_avgdl=idx.bound_avgdl).count()
    run()  # warm
    lat = []
    for _ in range(REPS):
        t0 = time.time()
        run()
        lat.append((time.time() - t0) * 1000 / n_q)
    idx.terms.unpersist()
    return round(statistics.median(lat), 1)


def main() -> None:
    from elasticsearch_eslib_spark.config import get_spark
    from elasticsearch_eslib_spark.plans.append_index import append_index
    from elasticsearch_eslib_spark.plans.build_index import build_index
    from elasticsearch_eslib_spark.plans.compact_index import compact_index

    a = ensure_range(0, N)
    b = ensure_range(N, 2 * N)
    spark = get_spark("bench-append", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    work = tempfile.mkdtemp(prefix="bench_append_")
    out: dict = {"metric": "append vs rebuild economics", "n_docs_each": N,
                 "cpus": CPUS}

    idx_a = os.path.join(work, "idx_a")
    t0 = time.time()
    build_index(spark, a, idx_a)
    out["build_A_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    append_index(spark, b, idx_a)
    out["append_B_sec"] = round(time.time() - t0, 1)

    # cold rebuild over the union (two chunk dirs unioned via a symlink dir)
    both = os.path.join(work, "both")
    os.makedirs(both)
    for src in (a, b):
        for f in os.listdir(src):
            if f.endswith(".parquet") and os.path.getsize(
                    os.path.join(src, f)):
                os.symlink(os.path.join(src, f), os.path.join(both, f))
    idx_cold = os.path.join(work, "idx_cold")
    t0 = time.time()
    build_index(spark, both, idx_cold)
    out["rebuild_AB_sec"] = round(time.time() - t0, 1)
    out["append_vs_rebuild_speedup"] = round(
        out["rebuild_AB_sec"] / out["append_B_sec"], 2)

    # serve latency: 2-epoch (fragmented) vs compacted, back-to-back
    out["wand_p50_ms_appended"] = serve_p50(spark, idx_a)
    idx_c = os.path.join(work, "idx_compacted")
    t0 = time.time()
    compact_index(spark, idx_a, idx_c)
    out["compact_sec"] = round(time.time() - t0, 1)
    out["wand_p50_ms_compacted"] = serve_p50(spark, idx_c)
    out["wand_p50_ms_cold"] = serve_p50(spark, idx_cold)

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "append_bench.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
