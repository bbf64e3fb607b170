"""Deterministic synthetic fixtures (FIXTURES.md — seed 42, no wall-clock).

Generates the Common-Crawl-style `pages` table (BASELINE.json input_hint
shape) and the fixed 12-query reference set. The `text` column is the
golden extraction — produced by the canonical extractor, which the Spark
pandas-UDF path must match byte-identically.

This module replaces the reference's live sources (WebGetter /
TwitterMonitor / RabbitmqMonitor — SURVEY.md §2.1 rows 10–17): the engine
is offline, so fixture pages stand in for fetched web content.

A plain per-doc Python loop is fine HERE (fixture generation is pinned to
per-doc rng seeds by FIXTURES.md and is not an engine path).
"""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pandas as pd

from elasticsearch_eslib_spark.functions.extract import extract_text

VOCAB_SIZE = 10_000
ZIPF_S = 1.07
N_HEAD = 10           # ranks 0..9 are head terms, force-inserted p=0.55
PAGES_UNIT = 1_000
PAGES_CI = 100_000

_LANG_CYCLE = (["en"] * 10 + ["de"] * 3 + ["es"] * 3 + ["fr"] * 2 + ["zh"] * 2)

_EPOCH = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

# special marker terms for the exact-k / fewer-than-k queries
_QEXACT_DOCS = frozenset(range(1, 20, 2))   # 10 docs
_QFEWER_DOCS = frozenset((2, 4, 6))         # 3 docs


def _zipf_probs(n: int) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** -ZIPF_S
    return p / p.sum()

_VOCAB = np.array([f"t{i:06d}" for i in range(VOCAB_SIZE)])
_PROBS = _zipf_probs(VOCAB_SIZE)

# pinned list of 200 two-char CJK "words" for the zh analyzer path
_ZH_VOCAB = np.array([
    chr(0x4E00 + j) + chr(0x4E00 + (j * 7 + 3) % 400) for j in range(200)
])
_ZH_PROBS = _zipf_probs(200)


def _doc_body_words(i: int, lang: str) -> list[str]:
    rng = np.random.default_rng(42 + i)
    length = int(np.clip(rng.lognormal(mean=np.log(120.0), sigma=0.6), 8, 1024))
    if lang == "zh":
        words = list(rng.choice(_ZH_VOCAB, size=length, p=_ZH_PROBS))
    else:
        words = list(rng.choice(_VOCAB, size=length, p=_PROBS))
        head_mask = rng.random(N_HEAD) < 0.55
        for h in range(N_HEAD):
            if head_mask[h]:
                words[h % length] = f"t{h:06d}"
    if i in _QEXACT_DOCS:
        words.append("qexactk")
    if i in _QFEWER_DOCS:
        words.append("qfewer")
    return words


def _doc_html(i: int, words: list[str]) -> str:
    # join with double space every 7th gap + one literal &lt;tag&gt; entity
    parts: list[str] = []
    for j, w in enumerate(words):
        if j:
            parts.append("  " if j % 7 == 0 else " ")
        parts.append(w)
    body = "".join(parts)
    w0 = words[0]
    w1 = words[1] if len(words) > 1 else words[0]
    return (
        f"<html><head><title>T{i}</title><style>p{{color:red}}</style>\n"
        f"<script>var x=1;</script></head>\n"
        f"<body><h1>{w0} &amp; {w1}</h1>\n"
        f"<p>{body} &lt;tag&gt;</p>\n"
        f"<!-- comment dropped --></body></html>"
    )


def gen_pages_range(lo: int, hi: int) -> pd.DataFrame:
    """Rows for doc ids [lo, hi) — per-doc rng seeds make any chunking
    produce byte-identical rows (parallel fixture generation)."""
    rows = []
    for i in range(lo, hi):
        lang = _LANG_CYCLE[i % 20]
        words = _doc_body_words(i, lang)
        html = _doc_html(i, words)
        html_bytes = html.encode("utf-8")
        rows.append({
            "url": f"https://site{i % 97}.example.org/p/{i:08d}",
            "warc_ts": _EPOCH + dt.timedelta(seconds=i),
            "html": html_bytes,
            "text": extract_text(html_bytes),
            "lang": lang,
        })
    return pd.DataFrame(rows)


def gen_pages(n_docs: int = PAGES_UNIT) -> pd.DataFrame:
    return gen_pages_range(0, n_docs)


def gen_queries() -> pd.DataFrame:
    """Fixed reference query set (FIXTURES.md §2); analyzed with lang='en'."""
    zh_q = f"{_ZH_VOCAB[0]} {_ZH_VOCAB[1]}"
    qs = [
        "t004321",                                  # 0 single tail term
        "t000000",                                  # 1 single head term
        "t000001 t002222",                          # 2 head+tail
        "t001111 t003333 t005555",                  # 3 three tail terms
        "t000002 t000777 t004444 t008888",          # 4 four mixed
        "zzznotaterm",                              # 5 absent from corpus
        "the and of",                               # 6 all stopwords → empty
        "t001234 t001234",                          # 7 duplicate term
        "T000123, t000456!",                        # 8 case+punctuation
        zh_q,                                       # 9 zh unigram path
        "qexactk",                                  # 10 matches exactly k
        "qfewer",                                   # 11 matches < k
    ]
    return pd.DataFrame({
        "query_id": np.arange(len(qs), dtype=np.int64),
        "query": qs,
        "k": np.full(len(qs), 10, dtype=np.int32),
    })


def write_pages_parquet(path: str, n_docs: int = PAGES_UNIT) -> str:
    """Materialize the pages fixture once (idempotent by (path, n_docs))."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # Row-group size bounds scan parallelism: Spark can't split inside a
    # row group, so 10k-doc groups capped the 100k-doc bench corpus at a
    # 10-task extraction (measured: S1 ran 10-wide on 32 slots). 1,250-doc
    # groups (~1.7 MB) let the scan split ~80 ways — finer than any split
    # size S1 asks for — at negligible footer overhead. The marker carries
    # the layout so a fixture written by older code is regenerated (same
    # deterministic CONTENT — gen_pages is unchanged — different layout).
    row_group = 1_250
    marker = os.path.join(path, f"_FIXTURE_{n_docs}_rg{row_group}")
    out = os.path.join(path, "pages.parquet")
    if os.path.exists(marker) and os.path.exists(out):
        return out
    os.makedirs(path, exist_ok=True)
    for stale in os.listdir(path):  # a marker for a DIFFERENT size is stale
        if stale.startswith("_FIXTURE_"):
            os.remove(os.path.join(path, stale))
    pdf = gen_pages(n_docs)
    schema = pa.schema([
        pa.field("url", pa.string(), False),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC"), False),
        pa.field("html", pa.binary(), False),
        pa.field("text", pa.string(), True),
        pa.field("lang", pa.string(), False),
    ])
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    pq.write_table(table, out, row_group_size=row_group)
    with open(marker, "w") as fh:
        fh.write(str(n_docs))
    return out
