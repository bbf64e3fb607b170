#!/usr/bin/env python
"""CLI: compact (force-merge) a multi-epoch index into a fresh directory.

    spark-submit --py-files dist/elasticsearch_eslib_spark.zip \
        compact_index.py --src <index dir> --dst <new index dir>

The destination is a brand-new immutable index directory (doc/term ids
preserved, WAND bounds re-tightened); swap your pointer to it when done.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="existing index dir")
    ap.add_argument("--dst", required=True, help="fresh output index dir")
    args = ap.parse_args()

    from elasticsearch_eslib_spark.config import get_spark
    from elasticsearch_eslib_spark.plans.compact_index import compact_index

    spark = get_spark("eslib-compact-index")
    print(json.dumps(compact_index(spark, args.src, args.dst)))


if __name__ == "__main__":
    main()
