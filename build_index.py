#!/usr/bin/env python
"""CLI: build the inverted index.

    spark-submit --py-files dist/elasticsearch_eslib_spark.zip \
        build_index.py --input <pages parquet> --index <dir> [--resume]
    # incremental: append a NEW batch of pages as an epoch (exactly-once
    # per batch; existing blocks untouched — plans/append_index.py)
    build_index.py --input <delta parquet> --index <dir> --append

(BASELINE.json north_rule: run via spark-submit --py-files; locally the
script also runs under plain `python` — get_spark handles the session.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages parquet path")
    ap.add_argument("--index", required=True, help="index output dir")
    ap.add_argument("--resume", action="store_true",
                    help="resume from committed checkpoints/lineage")
    ap.add_argument("--append", action="store_true",
                    help="append --input as a new epoch to an EXISTING index")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--commit-groups", type=int, default=None,
                    help="S1 checkpoint commits (default: adaptive, one "
                         "per ~512MB of input, clamped to [1,8])")
    args = ap.parse_args()

    from elasticsearch_eslib_spark.config import get_spark

    spark = get_spark("eslib-build-index")
    if args.append:
        from elasticsearch_eslib_spark.plans.append_index import append_index

        metrics = append_index(spark, args.input, args.index)
    else:
        from elasticsearch_eslib_spark.plans.build_index import build_index

        metrics = build_index(spark, args.input, args.index,
                              resume=args.resume, n_buckets=args.buckets,
                              n_commit_groups=args.commit_groups)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
