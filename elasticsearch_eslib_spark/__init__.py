"""elasticsearch_eslib_spark — a brand-new PySpark-native inverted-index
build + BM25 query engine with the document-processing capabilities of the
public `comperiosearch/elasticsearch-eslib` pipeline library.

This is NOT a port: the reference is a per-row, push-based Python dataflow
framework (Processor/Generator/Monitor graphs over schemaless esdocs); this
engine re-expresses the same capabilities Spark-first — declarative
DataFrame plans optimized by Catalyst, vectorized Arrow/pandas UDFs for the
text path, explicit partitioning/salting for Zipfian skew, and a
block-compressed postings format with block-max metadata for WAND top-k.

Provenance note (see SURVEY.md §0): the reference tree at /root/reference/
was empty in every session so far; the binding spec is BASELINE.json
(north_rule / north_star / input_hint). Reference capabilities cited in
docstrings use the SURVEY.md §2.1 recalled inventory (eslib/procs/*.py).

Layout:
    schemas.py    — all table StructTypes (SURVEY.md §1.2)
    config.py     — engine constants (BM25 params, block size) + session builder
    fixtures.py   — deterministic `pages`/`queries` fixture generator (FIXTURES.md)
    oracle.py     — pure-Python index + BM25 oracle (never Spark)
    functions/    — extract (E1), analyze (E2), block codec (§2.5), text stats
    operators/    — build path E3–E10, query path Q1–Q5, dedup, similarity
    sources/      — table IO (Iceberg-or-manifest), ingest readers
    plans/        — build_index / run_queries pipeline drivers (+resume C1–C4)
    streaming/    — structured-streaming ingest (Monitor/Timer analogs)
"""

__version__ = "0.1.0"
