"""Query-serve driver (SURVEY.md §3.2 lifecycle 2).

Runs the fixture (or any) query set against a built index via either path:
'wand' (Q4, block-max WAND) or 'exhaustive' (Q5, decode-all + window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from elasticsearch_eslib_spark.operators.query import topk_exhaustive, topk_wand
from elasticsearch_eslib_spark.plans.build_index import Index


def run_queries(spark: SparkSession, index_dir: str, queries: DataFrame,
                path: str = "wand") -> DataFrame:
    idx = Index(spark, index_dir)
    if path == "wand":
        return topk_wand(queries, idx.terms, idx.postings, idx.n_docs,
                         idx.avg_dl, bound_avgdl=idx.bound_avgdl)
    return topk_exhaustive(queries, idx.terms, idx.postings, idx.n_docs,
                           idx.avg_dl)
