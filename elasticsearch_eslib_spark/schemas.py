"""All engine table schemas (SURVEY.md §1.2) as StructType constants.

The reference is schemaless (esdocs = nested dicts, duck-typed fields —
SURVEY.md §1.1); fixed schema-on-write is a deliberate upgrade required at
10^12-doc scale. Stage boundaries assert these schemas (the engine's analog
of eslib's socket/connector protocol compatibility checks).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input table — shape pinned by BASELINE.json input_hint.
PAGES = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType(), False),
    T.StructField("text", T.StringType(), True),   # golden extraction (fixtures)
    T.StructField("lang", T.StringType(), False),
])

DOCS = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("lang", T.StringType(), False),
    T.StructField("doc_len", T.IntegerType(), False),
])

TERMS = T.StructType([
    T.StructField("term_id", T.LongType(), False),
    T.StructField("term", T.StringType(), False),
    T.StructField("df", T.LongType(), False),
    T.StructField("cf", T.LongType(), False),
])

POSTINGS = T.StructType([
    T.StructField("term_id", T.LongType(), False),
    T.StructField("block_id", T.IntegerType(), False),
    T.StructField("n_docs", T.IntegerType(), False),
    T.StructField("first_doc", T.LongType(), False),
    T.StructField("last_doc", T.LongType(), False),
    T.StructField("block_max_tf", T.IntegerType(), False),
    T.StructField("block_max_score", T.DoubleType(), False),
    T.StructField("doc_deltas", T.BinaryType(), False),
    T.StructField("tfs", T.BinaryType(), False),
    T.StructField("dls", T.BinaryType(), False),
])

STATS = T.StructType([
    T.StructField("n_docs", T.LongType(), False),
    T.StructField("avg_dl", T.DoubleType(), False),
    T.StructField("built_at", T.TimestampType(), False),
    T.StructField("snapshot", T.StringType(), False),
])

LINEAGE = T.StructType([
    T.StructField("stage", T.StringType(), False),
    T.StructField("partition_id", T.IntegerType(), False),
    T.StructField("input_fingerprint", T.StringType(), False),
    T.StructField("status", T.StringType(), False),
    T.StructField("bytes", T.LongType(), False),
    T.StructField("wall_ms", T.LongType(), False),
    T.StructField("attempt", T.IntegerType(), False),
    T.StructField("updated", T.TimestampType(), False),
])

QUERIES = T.StructType([
    T.StructField("query_id", T.LongType(), False),
    T.StructField("query", T.StringType(), False),
    T.StructField("k", T.IntegerType(), False),
])

TOPK_RESULT = T.StructType([
    T.StructField("query_id", T.LongType(), False),
    T.StructField("rank", T.IntegerType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("score", T.DoubleType(), False),
])
