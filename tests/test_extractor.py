"""E1 byte-identity: canonical extractor edge cases + golden column
(SURVEY.md §5.2 row 1; the BASELINE.json per-row invariant)."""

import pandas as pd
import pytest

from elasticsearch_eslib_spark.functions.extract import extract_text


@pytest.mark.parametrize("html,expected", [
    (b"<p>hello world</p>", "hello world"),
    (b"<html><body><b>a</b> <i>b</i></body></html>", "a b"),
    # script/style content dropped, even with '>' inside strings
    (b"<script>if (a > b) { x = '</'; }</script>after", "after"),
    (b"<style>p { color: red; }</style>text", "text"),
    # nested script-ish content inside style
    (b"<div>one<script>var s=\"<p>not text</p>\";</script>two</div>", "onetwo"),
    # entities unescaped
    (b"a &amp; b &lt;tag&gt; &#39;q&#39;", "a & b <tag> 'q'"),
    # comments dropped
    (b"x<!-- hidden -->y", "xy"),
    # whitespace collapse: CRLF, LF, tabs, doubles
    (b"a\r\n b\n\nc\td  e", "a b c d e"),
    (b"  lead and trail  ", "lead and trail"),
    # empty body
    (b"<html><body></body></html>", ""),
    (b"", ""),
    # UTF-8 multibyte
    ("<p>héllo wörld — 中文</p>".encode("utf-8"), "héllo wörld — 中文"),
    # non-HTML bytes: invalid UTF-8 → replacement chars, no crash
    (b"\xff\xfe plain", "�� plain"),
    (None, None),
])
def test_extract_cases(html, expected):
    assert extract_text(html) == expected


def test_fixture_golden_bytes(pages_parquet):
    """pages.text is byte-identical to re-extraction from pages.html."""
    pdf = pd.read_parquet(pages_parquet)
    for html, golden in zip(pdf["html"], pdf["text"]):
        out = extract_text(html)
        assert out.encode("utf-8") == golden.encode("utf-8")


def test_spark_udf_byte_identity(spark, pages_parquet):
    """Spark pandas-UDF path == canonical oracle extractor, per url, on bytes."""
    from pyspark.sql import functions as F

    from elasticsearch_eslib_spark.functions.extract import extract_text_udf

    df = (spark.read.parquet(pages_parquet)
          .withColumn("spark_text", extract_text_udf()(F.col("html")))
          .select("url", "text", "spark_text"))
    mismatches = df.where(
        F.col("spark_text").cast("binary") != F.col("text").cast("binary"))
    assert mismatches.count() == 0
