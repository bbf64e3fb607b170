"""Pure-Python reference oracle: inverted index + exhaustive BM25 top-k.

Never touches Spark. With the reference tree empty (SURVEY.md §0), this
oracle — fed by the same canonical extractor/analyzer — produces the
"reference query set" golden results that BASELINE.json's rank-identical
requirement is tested against. FIXTURES.md §3 pins the scoring constants
and ordering used here.

Pinned scoring:
    idf(t)      = ln((N − df + 0.5) / (df + 0.5) + 1)          [Lucene-style]
    score(d,q)  = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
                  summed over DISTINCT query terms in ascending term_id
                  order (term_id order == lexicographic term order, §E5);
                  duplicate query terms contribute once (pinned).
    ordering    = (score desc, doc_id asc), ranks 1..k
    arithmetic  = float64 throughout.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from elasticsearch_eslib_spark.config import BM25_B, BM25_K1


@dataclass
class OracleIndex:
    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # term -> {doc -> tf}
    doc_len: dict[int, int] = field(default_factory=dict)
    n_docs: int = 0
    avg_dl: float = 0.0

    @property
    def terms_sorted(self) -> list[str]:
        return sorted(self.postings)

    def term_ids(self) -> dict[str, int]:
        """Dense deterministic ids: 1-based row_number over term asc (E5)."""
        return {t: i + 1 for i, t in enumerate(self.terms_sorted)}


def build_index(docs: list[tuple[int, list[str]]]) -> OracleIndex:
    """docs = [(doc_id, analyzed tokens)] — tokens already analyzer output."""
    idx = OracleIndex()
    for doc_id, tokens in docs:
        idx.doc_len[doc_id] = len(tokens)
        for tok in tokens:
            idx.postings.setdefault(tok, {}).setdefault(doc_id, 0)
            idx.postings[tok][doc_id] += 1
    idx.n_docs = len(idx.doc_len)
    idx.avg_dl = (sum(idx.doc_len.values()) / idx.n_docs) if idx.n_docs else 0.0
    return idx


def idf(n_docs: int, df: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_term_score(tf: int, dl: int, avg_dl: float, term_idf: float,
                    k1: float = BM25_K1, b: float = BM25_B) -> float:
    norm = tf + k1 * (1.0 - b + b * dl / avg_dl)
    return term_idf * tf * (k1 + 1.0) / norm


def bm25_topk(idx: OracleIndex, query_tokens: list[str], k: int,
              k1: float = BM25_K1, b: float = BM25_B) -> list[tuple[int, int, float]]:
    """Exhaustive scoring → [(rank, doc_id, score)], rank 1-based."""
    if idx.n_docs == 0:
        return []
    terms = sorted(set(query_tokens))  # distinct, term_id (lexicographic) order
    scores: dict[int, float] = {}
    for term in terms:
        plist = idx.postings.get(term)
        if not plist:
            continue
        t_idf = idf(idx.n_docs, len(plist))
        for doc_id, tf in plist.items():
            scores[doc_id] = scores.get(doc_id, 0.0) + bm25_term_score(
                tf, idx.doc_len[doc_id], idx.avg_dl, t_idf, k1, b)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(rank + 1, doc_id, score) for rank, (doc_id, score) in enumerate(ranked)]
