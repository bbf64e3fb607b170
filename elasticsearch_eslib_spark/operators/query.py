"""Query path Q1–Q5 (SURVEY.md §2.4): BM25 top-k over the block index.

Two independent execution paths produce identical results (a built-in
self-check required by SURVEY.md Q5 and tested in test_bm25_topk.py):

  * `topk_exhaustive` — decode every candidate block, score in JVM
    expressions, rank with a window (the oracle-shaped plan);
  * `topk_wand` — document-at-a-time block-max WAND inside one
    applyInPandas group per query: term upper bounds pick the pivot,
    block-max metadata skips blocks, survivors are fully evaluated with
    contributions summed in term_id order (pinned float64 determinism).

Scale notes: query-term lists are tiny (collected to the driver only to
build an `isin` predicate that prunes the postings scan down to a few
parquet partitions/row-groups — p_bucket directory pruning + term_id
min/max stats). Scoring needs no join against the docs table because
doc_len is packed inside each block (see build.py).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from elasticsearch_eslib_spark import schemas
from elasticsearch_eslib_spark.config import BM25_B, BM25_K1
from elasticsearch_eslib_spark.functions.analyze import analyze_text
from elasticsearch_eslib_spark.functions.codec import decode_posting_block

N_POSTING_BUCKETS = 32  # p_bucket = term_id % N_POSTING_BUCKETS (write + prune)


def analyze_queries(queries: DataFrame) -> DataFrame:
    """Q1: (query_id, query, k) → (query_id, k, term) distinct terms.

    Queries are analyzed with lang='en' (pinned, FIXTURES.md §2); duplicate
    query terms contribute once (pinned semantic, oracle.py).
    """

    def _an(iterator):
        for pdf in iterator:
            rows = {"query_id": [], "k": [], "term": []}
            for qid, q, k in zip(pdf["query_id"], pdf["query"], pdf["k"]):
                for term in sorted(set(analyze_text(q, "en"))):
                    rows["query_id"].append(qid)
                    rows["k"].append(k)
                    rows["term"].append(term)
            yield pd.DataFrame(rows)

    return queries.mapInPandas(_an, schema="query_id long, k int, term string")


def resolve_query_terms(qterms: DataFrame, terms: DataFrame,
                        n_docs: int) -> DataFrame:
    """Q2: attach term_id/df/idf. Unknown terms drop out (inner join).

    The matched vocabulary rows (≤ #query terms — driver metadata, like
    the term list itself) are collected once and re-broadcast as a local
    relation: downstream consumers (fetch_postings' prune list, the WAND
    fan-out rule keyed on max df) read them straight off the returned
    DataFrame's `_resolved_term_ids` / `_resolved_max_df` instead of each
    paying another action that would re-run the analyze+join pipeline."""
    spark = qterms.sparkSession
    term_list = [r["term"] for r in qterms.select("term").distinct().collect()]
    matched_rows = (terms.where(F.col("term").isin(term_list))
                    .select("term", "term_id", "df").collect()
                    if term_list else [])
    matched = spark.createDataFrame(
        matched_rows, "term string, term_id long, df long")
    resolved = (qterms.join(F.broadcast(matched), "term")
                .withColumn("idf", F.log(
                    (F.lit(float(n_docs)) - F.col("df") + 0.5)
                    / (F.col("df") + 0.5) + 1.0)))
    resolved._resolved_term_ids = sorted(  # noqa: SLF001
        {int(r["term_id"]) for r in matched_rows})
    resolved._resolved_max_df = max(  # noqa: SLF001
        (int(r["df"]) for r in matched_rows), default=0)
    return resolved


def fetch_postings(postings: DataFrame, resolved: DataFrame) -> DataFrame:
    """Q3: pruned postings scan for the resolved term ids."""
    tids = getattr(resolved, "_resolved_term_ids", None)
    if tids is None:  # resolved built outside resolve_query_terms (tests)
        tids = [r["term_id"] for r in
                resolved.select("term_id").distinct().collect()]
    buckets = sorted({t % N_POSTING_BUCKETS for t in tids})
    df = postings
    if "p_bucket" in postings.columns:
        df = df.where(F.col("p_bucket").isin(buckets))
    return df.where(F.col("term_id").isin(tids))


def decode_blocks(blocks: DataFrame) -> DataFrame:
    """Unpack block rows → (term_id, doc_id, tf, dl) posting rows."""
    import numpy as np

    def _decode(iterator):
        for pdf in iterator:
            outs = []
            for term_id, first_doc, deltas, tfs, dls in zip(
                    pdf["term_id"], pdf["first_doc"], pdf["doc_deltas"],
                    pdf["tfs"], pdf["dls"]):
                d, t, l = decode_posting_block(first_doc, deltas, tfs, dls)
                outs.append(pd.DataFrame({
                    "term_id": np.full(len(d), term_id, dtype=np.int64),
                    "doc_id": d, "tf": t, "dl": l}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return blocks.select("term_id", "first_doc", "doc_deltas", "tfs", "dls") \
        .mapInPandas(_decode, schema="term_id long, doc_id long, tf long, dl long")


def _score_col(avg_dl: float):
    tf, dl = F.col("tf").cast("double"), F.col("dl").cast("double")
    return (F.col("idf") * tf * (BM25_K1 + 1.0)
            / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / float(avg_dl))))


def topk_exhaustive(queries: DataFrame, terms: DataFrame, postings: DataFrame,
                    n_docs: int, avg_dl: float) -> DataFrame:
    """Q5: exhaustive scoring + window rank (the self-check path)."""
    resolved = resolve_query_terms(analyze_queries(queries), terms, n_docs)
    decoded = decode_blocks(fetch_postings(postings, resolved))
    scored = (decoded
              .join(F.broadcast(resolved.select("query_id", "k", "term_id", "idf")),
                    "term_id")
              .withColumn("part_score", _score_col(avg_dl))
              .groupBy("query_id", "k", "doc_id")
              .agg(F.sum("part_score").alias("score")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= F.col("k"))
            .select("query_id", F.col("rank").cast("int").alias("rank"),
                    "doc_id", "score"))


# ---------------------------------------------------------------------------
# Q4 — block-max WAND
# ---------------------------------------------------------------------------

_INF = float("inf")
_END = 2**62

# range-partitioned WAND sizing, keyed on the resolved query terms' MAX
# df — the postings volume the slowest task would sequentially chew — not
# on corpus size. BENCH/wand_stress.json pins the crossover: at df=500k a
# 32-range fan-out measured 0.73× (37% SLOWER) than single-task because
# the fan-out's fixed cost (block explode+shuffle, per-group applyInPandas
# setup, merge window ≈ 1.2 s on this box) exceeds the ~0.5 s of
# sequential WAND work it parallelizes; at df=5.4M with ~59k postings/task
# the same fan-out measured 2.11× FASTER. So: below SPLIT_MIN_DF run one
# task per query; above it, one range per ~TARGET_POSTINGS_PER_TASK of the
# max-df term (the measured sweet spot), capped at MAX_RANGES. At 10^12
# docs a df≈N/10 head term hits the cap → ~10^8 postings/task; raise
# n_ranges explicitly for hotter heads.
WAND_TARGET_POSTINGS_PER_TASK = 65_536
WAND_SPLIT_MIN_DF = 2_000_000
WAND_MAX_RANGES = 1024


def wand_auto_ranges(max_df: int) -> int:
    """The auto fan-out rule (see the constants block above): single task
    below the measured work/overhead crossover, else sized so the heaviest
    term's postings split into ~TARGET-sized chunks."""
    if max_df < WAND_SPLIT_MIN_DF:
        return 1
    return max(2, min(WAND_MAX_RANGES,
                      max_df // WAND_TARGET_POSTINGS_PER_TASK))


def ranged_blocks(blocks: DataFrame, width: int) -> DataFrame:
    """One row per (block, doc-id range) the block's [first_doc, last_doc]
    span overlaps — the shipping rule of range-partitioned WAND. Split out
    of topk_wand so tests can pin the per-task posting ceiling directly:
    no (query, range) group may ever hold a head term's full posting list
    (the single-task memory blow-up the partitioning exists to prevent)."""
    return blocks.withColumn(
        "range_id", F.explode(F.sequence(
            (F.col("first_doc") / width).cast("int"),
            (F.col("last_doc") / width).cast("int"))))


class _TermCursor:
    """Cursor over one query term's blocks, lazily decoded.

    Optional [lo, hi) doc-id bounds implement range-partitioned WAND: the
    cursor exposes only in-range postings (boundary blocks are masked at
    decode; blocks that fall entirely outside were never shipped to this
    range's task by the plan)."""

    __slots__ = ("term_id", "idf", "first", "last", "bmax", "deltas", "tfs",
                 "dls", "bi", "pi", "docs", "tf", "dl", "ub", "avg_dl",
                 "lo", "hi")

    def __init__(self, term_id, idf, block_pdf, avg_dl, lo=0, hi=_END):
        order = block_pdf["first_doc"].to_numpy().argsort(kind="stable")
        self.term_id = term_id
        self.idf = idf
        self.avg_dl = avg_dl
        self.lo = lo
        self.hi = hi
        self.first = block_pdf["first_doc"].to_numpy()[order]
        self.last = block_pdf["last_doc"].to_numpy()[order]
        self.bmax = block_pdf["block_max_score"].to_numpy()[order]
        self.deltas = block_pdf["doc_deltas"].to_numpy()[order]
        self.tfs = block_pdf["tfs"].to_numpy()[order]
        self.dls = block_pdf["dls"].to_numpy()[order]
        self.ub = float(self.bmax.max())
        self.bi = 0
        self.pi = 0
        self.docs = None
        self._load()

    def _load(self):
        while self.bi < len(self.first):
            docs, tf, dl = decode_posting_block(
                int(self.first[self.bi]), self.deltas[self.bi],
                self.tfs[self.bi], self.dls[self.bi])
            if self.lo > 0 or self.hi < _END:
                m = (docs >= self.lo) & (docs < self.hi)
                if not m.any():
                    self.bi += 1
                    continue
                docs, tf, dl = docs[m], tf[m], dl[m]
            self.docs, self.tf, self.dl = docs, tf, dl
            return
        self.docs = None

    def cur_doc(self) -> int:
        return _END if self.docs is None else int(self.docs[self.pi])

    def block_max(self) -> float:
        return 0.0 if self.docs is None else float(self.bmax[self.bi])

    def block_last(self) -> int:
        return _END if self.docs is None else int(self.last[self.bi])

    def advance(self) -> None:
        self.pi += 1
        if self.docs is not None and self.pi >= len(self.docs):
            self.bi += 1
            self.pi = 0
            self._load()

    def seek(self, target: int) -> None:
        """Advance to first doc >= target; block skip without decoding."""
        if self.docs is None:
            return
        if self.last[self.bi] < target:
            self.bi += int(np.searchsorted(self.last[self.bi:], target))
            self.pi = 0
            self._load()
            if self.docs is None:
                return
        self.pi += int(np.searchsorted(self.docs[self.pi:], target))
        if self.pi >= len(self.docs):
            self.bi += 1
            self.pi = 0
            self._load()

    def score(self) -> float:
        tf = float(self.tf[self.pi])
        dl = float(self.dl[self.pi])
        return (self.idf * tf * (BM25_K1 + 1.0)
                / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / self.avg_dl)))


def _wand_one_query(cursors: list[_TermCursor], k: int) -> list[tuple[int, float]]:
    """Block-max WAND: returns [(doc_id, score)] top-k, (score desc, doc asc)."""
    import heapq

    # heap of (score, -doc_id): min element is the weakest (lowest score,
    # then largest doc_id) — matches the (score desc, doc_id asc) final order.
    heap: list[tuple[float, int]] = []

    def threshold() -> float:
        return heap[0][0] if len(heap) >= k else -1.0

    while True:
        live = [c for c in cursors if c.cur_doc() < _END]
        if not live:
            break
        live.sort(key=lambda c: c.cur_doc())
        theta = threshold()
        # pivot: first prefix whose UB sum exceeds θ
        acc = 0.0
        pivot_i = -1
        for i, c in enumerate(live):
            acc += c.ub
            if acc > theta:
                pivot_i = i
                break
        if pivot_i < 0:
            break  # even all UBs together can't beat θ
        pivot_doc = live[pivot_i].cur_doc()
        # the pivot is a DOCUMENT: every cursor already positioned at it
        # participates (otherwise the skip target can collapse onto the
        # pivot itself — livelock — and its contribution would be lost)
        while pivot_i + 1 < len(live) and live[pivot_i + 1].cur_doc() == pivot_doc:
            pivot_i += 1
        if live[0].cur_doc() == pivot_doc:
            # all cursors ≤ pivot are positioned at pivot-capable blocks:
            # block-max check before full evaluation
            # live[0..pivot_i] all sit exactly at pivot_doc (sorted + equal
            # to live[0]), so each current block contains pivot_doc and its
            # block_max is a valid upper bound for the pivot's total score.
            bm_sum = 0.0
            for c in live[:pivot_i + 1]:
                bm_sum += c.block_max()
            if bm_sum <= theta:
                # skip: jump past the nearest block boundary among pivots
                boundary = min(c.block_last() for c in live[:pivot_i + 1])
                target = boundary + 1
                nxt = live[pivot_i + 1].cur_doc() if pivot_i + 1 < len(live) else _END
                target = min(target, nxt) if nxt < _END else target
                for c in live[:pivot_i + 1]:
                    if c.cur_doc() < target:
                        c.seek(target)
                continue
            # full evaluation — contributions in term_id order (pinned)
            matching = sorted((c for c in live if c.cur_doc() == pivot_doc),
                              key=lambda c: c.term_id)
            s = 0.0
            for c in matching:
                s += c.score()
            entry = (s, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, entry)
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
            for c in matching:
                c.advance()
        else:
            # advance the largest-UB cursor that is STRICTLY before the
            # pivot doc (cursors tied at the pivot must stay put — seeking
            # them is a no-op and would livelock)
            adv = max((c for c in live[:pivot_i] if c.cur_doc() < pivot_doc),
                      key=lambda c: c.ub)
            adv.seek(pivot_doc)

    out = sorted(((-d, s) for s, d in heap), key=lambda t: (-t[1], t[0]))
    return [(doc, score) for doc, score in out]


def topk_wand(queries: DataFrame, terms: DataFrame, postings: DataFrame,
              n_docs: int, avg_dl: float,
              n_ranges: int | None = None,
              bound_avgdl: float | None = None) -> DataFrame:
    """Q4: block-max WAND, range-partitioned.

    A single WAND task per query would hold EVERY posting block of every
    query term — fatal for a head term at 10^12 docs. Instead the doc-id
    space is cut into `n_ranges` ranges (default: keyed on the resolved
    terms' max df — 1 below WAND_SPLIT_MIN_DF, else one range per
    ~WAND_TARGET_POSTINGS_PER_TASK postings of the heaviest term, capped
    at WAND_MAX_RANGES; constants measured in BENCH/wand_stress.json).
    Each block row is shipped to the range(s) its [first_doc,
    last_doc] span overlaps (blocks are ~BLOCK_SIZE docs, so boundary
    duplication is negligible), partial WAND runs per (query_id, range_id)
    with [lo, hi) cursor bounds, and a final window merges the per-range
    top-k — every doc is fully scored in exactly one range (its own), so
    scores are bit-identical to the single-task path."""
    resolved = resolve_query_terms(analyze_queries(queries), terms, n_docs)
    blocks = fetch_postings(postings, resolved)
    # WAND skipping bound, derived from per-block metadata at query time:
    #   block_max_raw · idf(N_now, df_now) · drift · (1 + 1e-12)
    # where drift = max(1, avgdl_now / bound_avgdl) compensates avgdl
    # movement since the block was encoded (raw grows monotonically as
    # avgdl grows — the ratio bounds it; see schemas.POSTINGS). The 1e-12
    # absorbs last-ulp ln() differences between JVM and libm. For a
    # single-epoch index bound_avgdl == avg_dl and this reduces to the
    # exact per-block max.
    avg_dl_f = float(avg_dl)
    drift = max(1.0, avg_dl_f / float(bound_avgdl or avg_dl))
    grouped = (blocks.join(
        F.broadcast(resolved.select("query_id", "k", "term_id", "idf")),
        "term_id")
        .withColumn("block_max_score",
                    F.col("block_max_raw") * F.col("idf")
                    * F.lit(drift * (1.0 + 1e-12))))
    if n_ranges is None:
        max_df = getattr(resolved, "_resolved_max_df", None)
        if max_df is None:  # resolved built by hand (tests)
            max_df = int(resolved.agg(
                F.max("df")).collect()[0][0] or 0)
        n_ranges = wand_auto_ranges(int(max_df))
    # doc ids are dense 1..n_docs (E3); width covers the full id space
    width = max(1, (n_docs + n_ranges) // n_ranges)

    def _mk_rows(qid, top):
        return pd.DataFrame({
            "query_id": [qid] * len(top),
            "rank": list(range(1, len(top) + 1)),
            "doc_id": [d for d, _ in top],
            "score": [s for _, s in top],
        })

    if n_ranges <= 1:
        def _wand(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) == 0:
                return pd.DataFrame(
                    columns=["query_id", "rank", "doc_id", "score"])
            qid = int(pdf["query_id"].iloc[0])
            k = int(pdf["k"].iloc[0])
            cursors = [
                _TermCursor(int(tid), float(g["idf"].iloc[0]), g, avg_dl_f)
                for tid, g in pdf.groupby("term_id", sort=True)
            ]
            return _mk_rows(qid, _wand_one_query(cursors, k))

        return grouped.groupBy("query_id").applyInPandas(
            _wand, schema=schemas.TOPK_RESULT)

    ranged = ranged_blocks(grouped, width)

    def _wand_range(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(columns=["query_id", "rank", "doc_id", "score"])
        qid = int(pdf["query_id"].iloc[0])
        k = int(pdf["k"].iloc[0])
        rid = int(pdf["range_id"].iloc[0])
        lo, hi = rid * width, (rid + 1) * width
        cursors = [
            _TermCursor(int(tid), float(g["idf"].iloc[0]), g, avg_dl_f,
                        lo=lo, hi=hi)
            for tid, g in pdf.groupby("term_id", sort=True)
        ]
        cursors = [c for c in cursors if c.docs is not None]
        if not cursors:
            return pd.DataFrame(columns=["query_id", "rank", "doc_id", "score"])
        return _mk_rows(qid, _wand_one_query(cursors, k))

    partial = ranged.groupBy("query_id", "range_id").applyInPandas(
        _wand_range, schema=schemas.TOPK_RESULT)
    # merge: per-range candidates are ≤ k rows each — the window input is
    # tiny (≤ k · n_ranges per query), nothing like the postings volume
    k_by_q = resolved.select("query_id", "k").distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    return (partial.drop("rank")
            .join(F.broadcast(k_by_q), "query_id")
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= F.col("k"))
            .select("query_id", F.col("rank").cast("int").alias("rank"),
                    "doc_id", "score"))


def topk_score_math(n_docs: int, df: int, tf: int, dl: int, avg_dl: float) -> float:
    """Scalar reference formula (used by tests to cross-check paths)."""
    idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    return idf * tf * (BM25_K1 + 1.0) / (
        tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avg_dl))
