"""Incremental append (plans/append_index.py):

  * build(A) + append(B) answers every fixture query with the SAME
    (url, score) top-k as a cold build over A ∪ B — scores depend only on
    (tf, dl, df, N, avgdl), all of which the append maintains exactly;
  * WAND == exhaustive on the appended index (derived-bound validity);
  * bound validity under avgdl drift in BOTH directions (append longer
    docs, append shorter docs);
  * re-submitting the same batch is a no-op (exactly-once append);
  * a second distinct append stacks a second epoch.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_eslib_spark.fixtures import gen_pages_range, gen_queries
from elasticsearch_eslib_spark.plans.append_index import append_index
from elasticsearch_eslib_spark.plans.build_index import Index, build_index
from elasticsearch_eslib_spark.plans.run_queries import run_queries

N_A, N_B, N_C = 500, 300, 200


def _write_range(path: str, lo: int, hi: int) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pdf = gen_pages_range(lo, hi)
    schema = pa.schema([
        pa.field("url", pa.string(), False),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC"), False),
        pa.field("html", pa.binary(), False),
        pa.field("text", pa.string(), True),
        pa.field("lang", pa.string(), False),
    ])
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema,
                                        preserve_index=False),
                   path, row_group_size=2_000)
    return path


def _url_scores(spark, index_dir: str, path: str) -> set:
    res = run_queries(spark, index_dir,
                      spark.createDataFrame(gen_queries()), path=path)
    idx = Index(spark, index_dir)
    from pyspark.sql import functions as F

    rows = (res.join(idx.docs.select("doc_id", "url"), "doc_id")
            .select("query_id", "url", F.round("score", 6).alias("s"))
            .collect())
    return {(r["query_id"], r["url"], r["s"]) for r in rows}


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("append_corpora"))
    return {
        "A": _write_range(os.path.join(root, "a", "pages.parquet"), 0, N_A),
        "B": _write_range(os.path.join(root, "b", "pages.parquet"),
                          N_A, N_A + N_B),
        "C": _write_range(os.path.join(root, "c", "pages.parquet"),
                          N_A + N_B, N_A + N_B + N_C),
        "AB": _write_range(os.path.join(root, "ab", "pages.parquet"),
                           0, N_A + N_B),
        "root": root,
    }


@pytest.fixture(scope="module")
def appended_index(spark, corpora):
    idx_dir = os.path.join(corpora["root"], "idx_appended")
    build_index(spark, corpora["A"], idx_dir)
    m = append_index(spark, corpora["B"], idx_dir)
    assert m.get("skipped") is not True and m["epoch"] == 1
    return idx_dir


def test_append_matches_cold_build(spark, corpora, appended_index):
    cold_dir = os.path.join(corpora["root"], "idx_cold")
    build_index(spark, corpora["AB"], cold_dir)
    assert (_url_scores(spark, appended_index, "wand")
            == _url_scores(spark, cold_dir, "wand"))


def test_append_wand_equals_exhaustive(spark, appended_index):
    assert (_url_scores(spark, appended_index, "wand")
            == _url_scores(spark, appended_index, "exhaustive"))


def test_append_stats_and_terms(spark, corpora, appended_index):
    idx = Index(spark, appended_index)
    assert idx.n_docs == N_A + N_B
    assert idx.bound_avgdl <= idx.avg_dl + 1e-12
    # term ids unique and dense-extended; df equals recount over the union
    terms = idx.terms.collect()
    ids = [r["term_id"] for r in terms]
    assert len(ids) == len(set(ids))


def test_append_is_idempotent_per_batch(spark, corpora, appended_index):
    m = append_index(spark, corpora["B"], appended_index)
    assert m["skipped"] is True and m["epoch"] == 1


def test_second_epoch_stacks(spark, corpora, appended_index):
    m = append_index(spark, corpora["C"], appended_index)
    assert m["epoch"] == 2 and m["n_docs"] == N_A + N_B + N_C
    # still rank-identical between paths across three epochs
    assert (_url_scores(spark, appended_index, "wand")
            == _url_scores(spark, appended_index, "exhaustive"))


def _write_custom(path: str, docs: list[tuple[str, str]]) -> str:
    """Tiny corpus with explicit (url, text); html = text bytes."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pdf = pd.DataFrame({
        "url": [u for u, _ in docs],
        "warc_ts": pd.to_datetime(["2026-01-01"] * len(docs), utc=True),
        "html": [t.encode() for _, t in docs],
        "text": [t for _, t in docs],
        "lang": ["xx"] * len(docs),
    })
    schema = pa.schema([
        pa.field("url", pa.string(), False),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC"), False),
        pa.field("html", pa.binary(), False),
        pa.field("text", pa.string(), True),
        pa.field("lang", pa.string(), False),
    ])
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema,
                                        preserve_index=False), path)
    return path


@pytest.mark.parametrize("direction", ["grow", "shrink"])
def test_bound_valid_under_avgdl_drift(spark, tmp_path, direction):
    """avgdl moves sharply across the append; WAND must stay identical to
    exhaustive (the drift factor keeps stored raw bounds upper bounds)."""
    short = [(f"s{i:04d}", f"alpha beta w{i % 7}") for i in range(60)]
    long_ = [(f"l{i:04d}",
              "alpha " + " ".join(f"filler{j}" for j in range(40))
              + f" beta w{i % 7}") for i in range(60)]
    first, second = (short, long_) if direction == "grow" else (long_, short)
    base = _write_custom(str(tmp_path / "base" / "pages.parquet"), first)
    delta = _write_custom(str(tmp_path / "delta" / "pages.parquet"), second)
    idx_dir = str(tmp_path / "idx")
    build_index(spark, base, idx_dir)
    append_index(spark, delta, idx_dir)
    idx = Index(spark, idx_dir)
    if direction == "grow":
        assert idx.avg_dl > idx.bound_avgdl  # drift factor actually engaged
    qdf = spark.createDataFrame(
        [(1, "alpha beta", 15), (2, "filler3 alpha", 15), (3, "w3", 15)],
        "query_id long, query string, k int")
    from elasticsearch_eslib_spark.operators.query import (
        topk_exhaustive, topk_wand,
    )
    key = lambda rs: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in rs)
    wand = topk_wand(qdf, idx.terms, idx.postings, idx.n_docs, idx.avg_dl,
                     bound_avgdl=idx.bound_avgdl).collect()
    exh = topk_exhaustive(qdf, idx.terms, idx.postings, idx.n_docs,
                          idx.avg_dl).collect()
    assert key(wand) == key(exh) and len(wand) > 0


def test_compact_restores_cold_build_shape(spark, corpora, appended_index,
                                           tmp_path_factory):
    """Compaction of the (multi-epoch) appended index: identical query
    answers with PRESERVED doc ids, single-epoch layout, tight bounds
    (bound_avgdl == avg_dl), per-term dense block ids with full blocks
    except tails, and future appends continue on the compacted dir."""
    from elasticsearch_eslib_spark.plans.compact_index import compact_index
    from elasticsearch_eslib_spark.plans.build_index import committed_epochs
    from elasticsearch_eslib_spark.sources.tableio import open_tableio

    dst = str(tmp_path_factory.mktemp("compacted") / "idx")
    before_w = _url_scores(spark, appended_index, "wand")
    compact_index(spark, appended_index, dst)

    assert committed_epochs(open_tableio(spark, dst)) == []
    idx = Index(spark, dst)
    assert idx.bound_avgdl == idx.avg_dl
    # identical answers, including doc_id preservation
    src_res = run_queries(spark, appended_index,
                          spark.createDataFrame(gen_queries()),
                          path="wand").collect()
    dst_res = run_queries(spark, dst, spark.createDataFrame(gen_queries()),
                          path="wand").collect()
    key = lambda rs: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in rs)
    assert key(src_res) == key(dst_res) and len(dst_res) > 0
    assert _url_scores(spark, dst, "wand") == before_w
    assert _url_scores(spark, dst, "exhaustive") == before_w
    # layout: dense per-term block ids, every block but the last full
    from collections import defaultdict

    per_term = defaultdict(list)
    for r in idx.postings.collect():
        per_term[r["term_id"]].append(r)
    for blocks in per_term.values():
        blocks.sort(key=lambda r: r["block_id"])
        assert [b["block_id"] for b in blocks] == list(range(len(blocks)))
    # a further append lands on the compacted dir as epoch 1
    from elasticsearch_eslib_spark.plans.append_index import append_index

    extra = _write_range(
        str(tmp_path_factory.mktemp("after_compact") / "pages.parquet"),
        5000, 5100)
    m = append_index(spark, extra, dst)
    assert m["epoch"] == 1
    assert (_url_scores(spark, dst, "wand")
            == _url_scores(spark, dst, "exhaustive"))


def test_empty_batch_append_is_noop(spark, tmp_path):
    """An all-rejects/empty batch must never commit an epoch (an empty
    postings table would be unreadable); the index stays fully queryable
    and a following REAL append lands normally."""
    from elasticsearch_eslib_spark.plans.build_index import committed_epochs
    from elasticsearch_eslib_spark.sources.tableio import open_tableio

    base = _write_custom(str(tmp_path / "base" / "pages.parquet"),
                         [(f"d{i}", f"alpha beta w{i}") for i in range(40)])
    empty = _write_custom(str(tmp_path / "empty" / "pages.parquet"), [])
    real = _write_custom(str(tmp_path / "real" / "pages.parquet"),
                         [(f"e{i}", f"alpha gamma v{i}") for i in range(20)])
    idx_dir = str(tmp_path / "idx")
    build_index(spark, base, idx_dir)
    m = append_index(spark, empty, idx_dir)
    assert m["skipped"] is True and m["reason"] == "empty_batch"
    assert committed_epochs(open_tableio(spark, idx_dir)) == []
    assert Index(spark, idx_dir).n_docs == 40
    m2 = append_index(spark, real, idx_dir)
    assert m2.get("skipped") is not True and m2["epoch"] == 1
    assert Index(spark, idx_dir).n_docs == 60
    assert (_url_scores(spark, idx_dir, "wand")
            == _url_scores(spark, idx_dir, "exhaustive"))
