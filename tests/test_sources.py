"""File sources/sinks (eslib FileReader/FileWriter/CsvConverter analogs)
and enrichment operators (EntityExtractor/PatternRemover analogs)."""

import re

from pyspark.sql import functions as F
from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"


def test_read_lines_and_write_roundtrip(spark, tmp_path):
    from elasticsearch_eslib_spark.sources.readers import read_lines, write_docs

    src = tmp_path / "in.txt"
    src.write_text("alpha\nbeta\ngamma\n")
    df = read_lines(spark, str(src))
    assert [r["line"] for r in df.orderBy("line").collect()] == \
        ["alpha", "beta", "gamma"]
    write_docs(df, str(tmp_path / "out"), fmt="json")
    back = spark.read.json(str(tmp_path / "out"))
    assert back.count() == 3


def test_read_json_quarantine(spark, tmp_path):
    from elasticsearch_eslib_spark.sources.readers import (
        read_json_docs, split_rejects,
    )

    src = tmp_path / "docs.jsonl"
    src.write_text('{"id": 1, "name": "ok"}\n'
                   'THIS IS NOT JSON\n'
                   '{"id": 2, "name": "fine"}\n')
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ])
    df = read_json_docs(spark, str(src), schema)
    good, rejects = split_rejects(df)
    assert sorted(r["id"] for r in good.collect()) == [1, 2]
    assert rejects.count() == 1  # skip-and-quarantine, never task failure


def test_read_csv_and_parse_lines(spark, tmp_path):
    from elasticsearch_eslib_spark.sources.readers import (
        parse_csv_lines, read_csv_docs, read_lines,
    )

    src = tmp_path / "rows.csv"
    src.write_text("1,foo,2.5\n2,bar,3.5\n")
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("label", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ])
    df = read_csv_docs(spark, str(src), schema)
    assert {(r["id"], r["label"]) for r in df.collect()} == \
        {(1, "foo"), (2, "bar")}
    # CsvConverter shape: parse a string column in-flight
    lines = read_lines(spark, str(src))
    parsed = parse_csv_lines(lines, "line",
                             "id long, label string, score double")
    assert {(r["id"], r["label"]) for r in parsed.collect()} == \
        {(1, "foo"), (2, "bar")}


def test_extract_entities_semantics(spark):
    import pandas as pd

    from elasticsearch_eslib_spark.operators.enrich import (
        BIGRAM_ENTITIES, UNIGRAM_ENTITIES, extract_entities,
    )

    rows = extract_entities(spark, SF).collect()
    got = {(r["doc_id"], r["entity"]): r["n_matches"] for r in rows}
    # python oracle over the raw text
    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    uni = dict(UNIGRAM_ENTITIES)
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        toks = [t for t in text.split(" ") if t]
        for ent in uni:
            n = toks.count(ent)
            assert got.get((doc_id, ent), 0) == n, (doc_id, ent)
        for ent, _cat in BIGRAM_ENTITIES:
            a, b = ent.split(" ")
            n = sum(1 for i in range(len(toks) - 1)
                    if toks[i] == a and toks[i + 1] == b)
            assert got.get((doc_id, ent), 0) == n, (doc_id, ent)


def test_pattern_scrub_matches_python(spark):
    import pandas as pd

    from elasticsearch_eslib_spark.operators.enrich import (
        SCRUB_PATTERN, pattern_scrub,
    )

    got = {r["doc_id"]: r["clean_len"]
           for r in pattern_scrub(spark, SF).collect()}
    pdf = pd.read_parquet(f"{SF}/documents.parquet").head(100)
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        expect = len(re.sub(r"\s+", " ", re.sub(SCRUB_PATTERN, "", text)).strip())
        assert got[doc_id] == expect, doc_id
