"""E2 analyzer chain: determinism, language behavior, CJK unigrams."""

from elasticsearch_eslib_spark.config import MAX_TOKEN_LEN
from elasticsearch_eslib_spark.functions.analyze import STOPWORDS, analyze_text


def test_basic_tokenize():
    assert analyze_text("Hello, World! foo_bar", "en") == ["hello", "world", "foo", "bar"]


def test_stopwords_en():
    assert analyze_text("the cat and the hat", "en") == ["cat", "hat"]


def test_stopwords_lang_scoped():
    # 'der' is a German stopword, not an English one
    assert "der" not in analyze_text("der Hund", "de")
    assert "der" in analyze_text("der Hund", "en")
    # unknown lang → no stopword removal
    assert analyze_text("the cat", "xx") == ["the", "cat"]


def test_all_stopword_query_is_empty():
    assert analyze_text("the and of", "en") == []


def test_nfkc_and_case():
    # NFKC folds full-width latin; lowercase applies
    assert analyze_text("ＡＢＣ Déjà", "xx") == ["abc", "déjà"]


def test_cjk_unigrams():
    toks = analyze_text("中文abc漢字", "zh")
    assert toks == ["中", "文", "abc", "漢", "字"]


def test_length_clamp():
    long_tok = "x" * (MAX_TOKEN_LEN + 1)
    ok_tok = "y" * MAX_TOKEN_LEN
    assert analyze_text(f"{long_tok} {ok_tok}", "en") == [ok_tok]


def test_empty_and_none():
    assert analyze_text("", "en") == []
    assert analyze_text(None, "en") == []
    assert analyze_text("!!! ...", "en") == []


def test_determinism():
    s = "The quick; brown FOX — jumps over 中文 the lazy dog!"
    assert analyze_text(s, "en") == analyze_text(s, "en")


def test_stopword_lists_pinned():
    # lists are part of index semantics; catching accidental edits
    assert "the" in STOPWORDS["en"] and "und" in STOPWORDS["de"]
    assert STOPWORDS["zh"] == frozenset()


def test_spark_udf_matches_oracle(spark, pages_parquet):
    from pyspark.sql import functions as F

    from elasticsearch_eslib_spark.functions.analyze import analyze_udf

    df = (spark.read.parquet(pages_parquet).limit(200)
          .withColumn("tokens", analyze_udf()(F.col("text"), F.col("lang")))
          .select("text", "lang", "tokens"))
    for row in df.collect():
        assert list(row["tokens"]) == analyze_text(row["text"], row["lang"])


def test_cjk_fast_path_identity():
    """The _CJK_RE presence probe + no-ideograph comprehension fast path
    must be token-identical to the per-char reference form at every
    boundary codepoint of the pinned CJK ranges (0x3400-0x9FFF,
    0xF900-0xFAFF) and on mixed tokens."""
    import unicodedata

    from elasticsearch_eslib_spark.config import MAX_TOKEN_LEN
    from elasticsearch_eslib_spark.functions.analyze import (
        _TOKEN_RE, _is_cjk, _split_cjk,
    )

    def reference(text, lang):
        if not text:
            return []
        norm = unicodedata.normalize("NFKC", text).lower()
        raw = _TOKEN_RE.findall(norm)
        stop = STOPWORDS.get(lang or "", frozenset())
        out = []
        for tok in raw:
            parts = _split_cjk(tok) if any(_is_cjk(c) for c in tok) else (tok,)
            out.extend(p for p in parts
                       if p not in stop and len(p) <= MAX_TOKEN_LEN)
        return out

    cases = [
        "㏿㐀鿿ꀀ",     # just-outside / boundary / outside
        "豈﫿ﬀ",
        "mix㐀ed tok鿿en latin123中文tail",
        "the and ascii only",
        "",
    ]
    for s in cases:
        for lang in ("en", "zh", "de", None, "xx"):
            assert analyze_text(s, lang) == reference(s, lang), (s, lang)
