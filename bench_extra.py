"""Per-query isolation bench (guide §1.4): times individual declared
queries with the noop sink so the computation is measured, not the sink or
the driver-side collect. NOT the driver's hook — bench.py is frozen; this
exists for same-window A/Bs during optimization (OPTIMIZATION_r06.md cites
these numbers).

Usage:
  SPARK_GRAFT_SF_DIR=... python bench_extra.py [query ...]
  (no args = the bench.py query list; repeats via BENCH_EXTRA_RUNS)

Prints one JSON line with per-query seconds (list per run).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("BENCH_EXTRA_RUNS", "1"))

    import __spark_entry__ as entrymod
    from elasticsearch_eslib_spark.config import get_spark

    spark = get_spark("bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    qs = entrymod.queries()
    names = sys.argv[1:] or [
        "bm25_topk", "tokenize_tf", "minhash_signatures",
        "minhash_lsh_pairs", "simhash", "simhash_pairs",
        "jaccard_vs_seed", "ann_bruteforce_topk", "embedding_near_dup",
        "fingerprint", "events_hourly", "user_sessions",
        "pricing_summary", "revenue_by_nation",
    ]
    timings: dict[str, list[float]] = {n: [] for n in names}
    for r in range(runs):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} run{r}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": sf_dir, "cpus": cpus, "queries": timings}))


if __name__ == "__main__":
    main()
