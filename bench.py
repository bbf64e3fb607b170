"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set = the engine's flagship paths: full index build over the
documents corpus (E1→E10), WAND query serve, relational BM25, the dedup
suite, ANN, and the heavy shuffle ops. `value` = total wall seconds.

Scaling evidence (BASELINE.md protocol) is produced by bench_scaling.py;
this script is the per-round driver hook.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from elasticsearch_eslib_spark.config import get_spark
    from elasticsearch_eslib_spark.operators.query import topk_wand
    from elasticsearch_eslib_spark.operators.fulltext import (
        FULLTEXT_QUERIES, TOPK_K,
    )
    from elasticsearch_eslib_spark.plans.build_index import Index, build_index

    spark = get_spark("bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    # q1: full index build (E1..E10) over a 100k-doc pages fixture, cold
    # index dir. The sf_dir documents table (≤5k rows) is too small to
    # measure a build — fixed per-job overhead would dominate; the fixture
    # is generated once and cached (FIXTURES.md corpus at bench scale).
    from elasticsearch_eslib_spark.fixtures import write_pages_parquet

    repo = os.path.dirname(os.path.abspath(__file__))
    n_docs = int(os.environ.get("BENCH_BUILD_DOCS", "100000"))
    pages_path = write_pages_parquet(
        os.path.join(repo, "BENCH", ".fixtures", "pages_bench"), n_docs)
    work = tempfile.mkdtemp(prefix="bench_idx_")
    index_dir = os.path.join(work, "index")
    timed("q1_index_build", lambda: build_index(spark, pages_path, index_dir))

    # q2: WAND query serve over the built index (full pinned query set)
    idx = Index(spark, index_dir)
    queries = spark.createDataFrame(
        [(qid, q, TOPK_K) for qid, q in FULLTEXT_QUERIES],
        "query_id long, query string, k int")
    timed("q2_wand_serve", lambda: topk_wand(
        queries, idx.terms, idx.postings, idx.n_docs, idx.avg_dl,
        bound_avgdl=idx.bound_avgdl).count())

    # q3+: driver-contract operators (the correctness-gated surface)
    qs = entrymod.queries()
    for i, name in enumerate([
        "bm25_topk", "tokenize_tf", "minhash_signatures",
        "minhash_lsh_pairs", "simhash", "simhash_pairs",
        "jaccard_vs_seed", "ann_bruteforce_topk", "embedding_near_dup",
        "fingerprint", "events_hourly",
        "user_sessions", "pricing_summary", "revenue_by_nation",
    ], start=3):
        timed(f"q{i}_{name}", lambda n=name: qs[n](spark, sf_dir).count())

    shutil.rmtree(work, ignore_errors=True)
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline suite wall-clock (index build + WAND serve + "
                  "operator suite)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "index_build_docs_per_sec": round(n_docs / timings["q1_index_build"], 1),
    }))


if __name__ == "__main__":
    main()
