#!/usr/bin/env python
"""CLI: run BM25 top-k queries against a built index.

    spark-submit --py-files dist/elasticsearch_eslib_spark.zip \
        run_queries.py --index <dir> [--queries <parquet>] [--path wand] \
        [--out <parquet>]

Without --queries, runs the pinned fixture query set (FIXTURES.md §2).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", default=None,
                    help="parquet with (query_id, query, k); default fixture set")
    ap.add_argument("--path", choices=("wand", "exhaustive"), default="wand")
    ap.add_argument("--out", default=None, help="write results parquet here")
    args = ap.parse_args()

    from elasticsearch_eslib_spark.config import get_spark
    from elasticsearch_eslib_spark.fixtures import gen_queries
    from elasticsearch_eslib_spark.plans.run_queries import run_queries

    spark = get_spark("eslib-run-queries")
    qdf = (spark.read.parquet(args.queries) if args.queries
           else spark.createDataFrame(gen_queries()))
    res = run_queries(spark, args.index, qdf, path=args.path)
    if args.out:
        res.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        for r in sorted(res.collect(),
                        key=lambda r: (r["query_id"], r["rank"])):
            print(f"{r['query_id']}\t{r['rank']}\t{r['doc_id']}\t{r['score']:.6f}")


if __name__ == "__main__":
    main()
