"""Dump .explain('formatted') for every benched/declared query to plans/r06/.

Usage: python scripts/dump_plans.py <suffix: before|after> [only ...]
Plans are captured at sf0.1 (plan SHAPE is scale-invariant for these
operators; probe-dependent branches note their branch in the text)."""
import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from elasticsearch_eslib_spark.config import get_spark  # noqa: E402

SF = os.environ.get("PLAN_SF", "/root/testdata/sf0.1")
OUT = "/root/repo/plans/r06"

QUERIES = [
    "bm25_topk", "tokenize_tf", "doc_len", "term_df",
    "minhash_signatures", "minhash_lsh_pairs", "simhash", "simhash_pairs",
    "jaccard_vs_seed", "ann_bruteforce_topk", "ann_lsh_topk",
    "embedding_near_dup", "fingerprint", "token_count", "quality_score",
    "lang_id", "events_hourly", "user_sessions", "pricing_summary",
    "revenue_by_nation", "dedup_exact", "graph_edges", "web_fetch",
    "extract_entities", "pattern_scrub", "topk_docs_per_lang",
    "media_features", "corpus_stats",
]


def main():
    suffix = sys.argv[1]
    only = set(sys.argv[2:])
    spark = get_spark("dump-plans", master="local[8]", shuffle_partitions=8)
    qs = entrymod.queries()
    for name in QUERIES:
        if only and name not in only:
            continue
        try:
            df = qs[name](spark, SF)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building plan: {e}"
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(f"-- {name} ({suffix}) @ {SF}\n{plan}")
        print("wrote", name)


if __name__ == "__main__":
    main()
