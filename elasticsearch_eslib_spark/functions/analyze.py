"""E2 — language-aware tokenization / analyzer chain.

Capability parity: the reference cleans text with regex processors
(``PatternRemover``, ``TweetEntityRemover`` — SURVEY.md §2.1 rows 7–8,
recalled) but has no analyzer; Elasticsearch performed analysis server-side.
BASELINE.json (north_star) requires "language-aware tokenization and
analyzer chains" in-engine, so the chain is pinned here and the SAME pure
function serves as the oracle analyzer (tests + fixtures use it directly).

Pinned chain (SURVEY.md E2):
  1. Unicode NFKC normalization;
  2. lowercase (str.lower);
  3. tokenize: maximal runs of word characters excluding underscore
     (regex ``[^\\W_]+`` with re.UNICODE);
  4. CJK handling: inside each raw token, every CJK ideograph
     (U+3400–U+9FFF, U+F900–U+FAFF) becomes its own unigram token; latin/
     digit subsequences between ideographs stay whole (pinned zh rule —
     no external segmentation models offline, SURVEY.md §7 hard part e);
  5. per-language stopword removal (pinned lists below; unknown lang →
     no removal);
  6. length clamp: tokens longer than MAX_TOKEN_LEN are dropped.

All-stopword queries therefore analyze to [] and return empty results —
a pinned semantic (FIXTURES.md §2).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd

from elasticsearch_eslib_spark.config import MAX_TOKEN_LEN

_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)
# same codepoint ranges as _is_cjk, as a C-speed presence probe: the old
# per-token `any(_is_cjk(c) for c in tok)` was ~1,000 Python-level calls
# per document — the analyzer's hottest loop (measured ~2× of its cost)
_CJK_RE = re.compile("[\u3400-\u9FFF\uF900-\uFAFF]")

# Pinned stopword lists — deliberately small and frozen: they are part of
# the index semantics (SURVEY.md §4.3 mitigation c) and are mirrored by the
# oracle and by the DuckDB oracle SQL (as IN-lists).
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "a an and are as at be by for from has he in is it its of on or "
        "that the to was were will with".split()
    ),
    "de": frozenset(
        "der die das und ist ein eine mit von zu den im für auf des".split()
    ),
    "es": frozenset(
        "el la los las de que y en un una es del por con para".split()
    ),
    "fr": frozenset(
        "le la les de des et un une du en est que pour dans par".split()
    ),
    "zh": frozenset(),
}


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return 0x3400 <= cp <= 0x9FFF or 0xF900 <= cp <= 0xFAFF


def _split_cjk(token: str) -> list[str]:
    out: list[str] = []
    buf: list[str] = []
    for ch in token:
        if _is_cjk(ch):
            if buf:
                out.append("".join(buf))
                buf = []
            out.append(ch)
        else:
            buf.append(ch)
    if buf:
        out.append("".join(buf))
    return out


def analyze_text(text: str | None, lang: str | None) -> list[str]:
    """Canonical oracle analyzer. Pure, deterministic, no Spark.

    The CJK presence checks use _CJK_RE (identical ranges to _is_cjk) and
    the common no-ideograph document takes a comprehension-only fast path
    — every raw token is a substring of `norm`, so `norm` containing no
    CJK char implies no token does. Output is identical to the per-char
    form at any input (pinned by test_analyzer fast-path identity)."""
    if not text:
        return []
    norm = unicodedata.normalize("NFKC", text).lower()
    raw = _TOKEN_RE.findall(norm)
    stop = STOPWORDS.get(lang or "", frozenset())
    if _CJK_RE.search(norm) is None:
        return [t for t in raw if t not in stop and len(t) <= MAX_TOKEN_LEN]
    tokens: list[str] = []
    for tok in raw:
        parts = _split_cjk(tok) if _CJK_RE.search(tok) else (tok,)
        for part in parts:
            if part not in stop and len(part) <= MAX_TOKEN_LEN:
                tokens.append(part)
    return tokens


def analyze_udf():
    """Scalar pandas UDF: (text, lang) -> array<string> tokens."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _analyze(text: pd.Series, lang: pd.Series) -> pd.Series:
        return pd.Series(
            [analyze_text(t, lg) for t, lg in zip(text, lang)], dtype=object
        )

    return _analyze
