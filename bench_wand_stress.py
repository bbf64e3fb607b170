#!/usr/bin/env python
"""Head-term WAND stress (BENCH/BASELINE.md protocol): one term at
df = N/2 over N >= 1M docs — the Zipfian worst case the range-partitioned
serve path exists for.

Measures, back-to-back in ONE window on the same warm index:
  * range-partitioned WAND (auto n_ranges — the shipped default)
  * single-task WAND (n_ranges=1 — what a naive per-query group does)
for a pure head-term query and a head+tail mix, p50 over REPS reps, and
verifies both paths return the IDENTICAL result set. Also reports the
head term's per-range posting ceiling from the real index blocks (the
serve-path analog of build-side salting; pinned in
tests/test_bm25_topk.py::test_ranged_blocks_pin_per_task_posting_ceiling).

Prints ONE JSON line and writes BENCH/wand_stress.json. Fixture and index
are cached under BENCH/.fixtures/ (generation and build are one-time).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N = int(os.environ.get("WAND_STRESS_DOCS", "1000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("WAND_STRESS_REPS", "7"))
HEAD = os.environ.get("WAND_STRESS_HEAD", "hh")  # every 2nd doc → df = N/2
# Point at an EXISTING index (e.g. the 6M-doc fixture index, whose
# force-inserted head terms reach df ≈ 0.9·N) instead of building the
# synthetic df=N/2 one — the same measurement at a heavier head.
IDX_OVERRIDE = os.environ.get("WAND_STRESS_INDEX")


def _gen_chunk(args) -> None:
    lo, hi, path = args
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(977_000 + lo)
    vocab = np.array([f"t{i:06d}" for i in range(5_000)])
    urls, texts = [], []
    for i in range(lo, hi):
        length = int(np.clip(rng.lognormal(np.log(24.0), 0.5), 6, 120))
        words = list(rng.choice(vocab, size=length))
        if i % 2 == 0:
            words[i % length] = HEAD
        urls.append(f"{i:012d}")
        texts.append(" ".join(words))
    tbl = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array([0] * len(urls), pa.timestamp("us", tz="UTC")),
        "html": pa.array([t.encode() for t in texts], pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["xx"] * len(urls), pa.string()),
    })
    pq.write_table(tbl, path, row_group_size=10_000)


def ensure_fixture() -> str:
    out_dir = os.path.join(REPO, "BENCH", ".fixtures", f"wand_stress_{N}")
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    import multiprocessing as mp

    os.makedirs(out_dir, exist_ok=True)
    chunk = 125_000
    todo = [(a, min(a + chunk, N),
             os.path.join(out_dir, f"part-{a:09d}.parquet"))
            for a in range(0, N, chunk)]
    with mp.Pool(min(8, len(todo))) as pool:
        pool.map(_gen_chunk, todo)
    open(marker, "w").close()
    return out_dir


def ensure_index(spark, pages_dir: str) -> str:
    from elasticsearch_eslib_spark.plans.build_index import build_index

    idx_dir = os.path.join(REPO, "BENCH", ".fixtures",
                           f"wand_stress_idx_{N}")
    if os.path.exists(os.path.join(idx_dir, "_manifest.json")):
        try:
            from elasticsearch_eslib_spark.plans.build_index import Index

            if Index(spark, idx_dir).n_docs == N:
                return idx_dir
        except Exception:
            pass
    m = build_index(spark, pages_dir, idx_dir)
    print(f"built stress index: {m['n_docs']} docs in "
          f"{m['wall_sec']:.0f}s", file=sys.stderr, flush=True)
    return idx_dir


def main() -> None:
    from pyspark.sql import functions as F

    from elasticsearch_eslib_spark.config import get_spark
    from elasticsearch_eslib_spark.operators.query import (
        ranged_blocks, topk_wand,
    )
    from elasticsearch_eslib_spark.plans.build_index import Index

    spark = get_spark("wand-stress", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    if IDX_OVERRIDE:
        idx = Index(spark, IDX_OVERRIDE)
    else:
        idx = Index(spark, ensure_index(spark, ensure_fixture()))
    idx.terms = idx.terms.persist()
    idx.terms.count()

    queries = spark.createDataFrame(
        [(0, HEAD, 10), (1, f"{HEAD} t000017", 10)],
        "query_id long, query string, k int")

    def run(n_ranges):
        return topk_wand(queries, idx.terms, idx.postings, idx.n_docs,
                         idx.avg_dl, n_ranges=n_ranges,
                         bound_avgdl=idx.bound_avgdl)

    # identity first (also warms both plans' codegen before timing)
    key = lambda df: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.collect())
    assert key(run(None)) == key(run(1)), "ranged != single-task result"

    walls: dict[str, list[float]] = {"ranged": [], "single": []}
    for _ in range(REPS):  # interleaved, same window
        for tag, nr in (("ranged", None), ("single", 1)):
            t0 = time.time()
            run(nr).count()
            walls[tag].append(time.time() - t0)
    p50 = {t: statistics.median(w) for t, w in walls.items()}

    # per-range posting ceiling of the head term, from the real index
    from elasticsearch_eslib_spark.operators.query import wand_auto_ranges

    head_tid = idx.terms.where(F.col("term") == HEAD).collect()[0]
    head_df = int(head_tid["df"])
    n_ranges_auto = wand_auto_ranges(head_df)
    width = max(1, (idx.n_docs + n_ranges_auto) // n_ranges_auto)
    hblocks = idx.postings.where(
        F.col("term_id") == head_tid["term_id"]).select(
        "term_id", "first_doc", "last_doc", "n_docs")
    per = (ranged_blocks(hblocks, width).groupBy("range_id")
           .agg(F.sum("n_docs").alias("p")).collect())
    max_per_task = max(r["p"] for r in per)

    result = {
        "metric": (f"head-term WAND: ranged vs single-task p50 "
                   f"(df={int(head_tid['df']) / idx.n_docs:.2f}N)"),
        "n_docs": idx.n_docs,
        "head_df": int(head_tid["df"]),
        "n_ranges_auto": n_ranges_auto,
        "p50_sec": {t: round(v, 3) for t, v in p50.items()},
        "speedup_ranged_over_single": round(
            p50["single"] / p50["ranged"], 2),
        "runs": {t: [round(w, 3) for w in ws] for t, ws in walls.items()},
        "head_max_postings_per_task": int(max_per_task),
        "head_task_share_of_df": round(
            max_per_task / float(head_tid["df"]), 4),
        "rank_identical": True,
        "cpus": CPUS,
        "load_avg_at_start": os.getloadavg()[1],
    }
    print(json.dumps(result))
    out_name = (f"wand_stress_{idx.n_docs}_{HEAD}.json" if IDX_OVERRIDE
                else "wand_stress.json")
    with open(os.path.join(REPO, "BENCH", out_name), "w") as fh:
        json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
