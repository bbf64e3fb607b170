"""File sources/sinks — the eslib FileReader / FileWriter / CsvConverter
analogs (SURVEY.md §2.1 rows 3–5).

The reference read lines/JSON documents from files or stdin per-row and
wrote them back out; Spark-first these are thin, schema-pinned wrappers
over `spark.read` / `df.write` so Catalyst gets pushdown/pruning and the
engine gets its quarantine semantics (malformed rows → rejects, never task
failures — eslib's skip-and-log behavior, SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """FileReader raw mode: one row per line → (line string)."""
    return spark.read.text(path).withColumnRenamed("value", "line")


def read_json_docs(spark: SparkSession, path: str,
                   schema: T.StructType) -> DataFrame:
    """FileReader json mode with quarantine: malformed rows land in a
    `_corrupt` column instead of failing the task (PERMISSIVE)."""
    full = schema.add("_corrupt", T.StringType(), True) \
        if "_corrupt" not in schema.fieldNames() else schema
    return (spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .json(path))


def split_rejects(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, rejects) from a read with a `_corrupt` column.

    Spark disallows plans whose scan references only the corrupt-record
    column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the
    parsed batch is persisted first — the documented pattern; ingest
    batches are bounded, and the persist is what a quarantine split
    re-reads for both halves anyway."""
    from pyspark.storagelevel import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    good = df.where(F.col("_corrupt").isNull()).drop("_corrupt")
    rejects = df.where(F.col("_corrupt").isNotNull())
    return good, rejects


def read_csv_docs(spark: SparkSession, path: str, schema: T.StructType,
                  sep: str = ",", header: bool = False) -> DataFrame:
    """CsvConverter analog: column-spec'd CSV parse (no inferSchema —
    schema-on-read is pinned, like the reference's column config)."""
    return (spark.read.schema(schema)
            .option("sep", sep)
            .option("header", str(header).lower())
            .option("mode", "PERMISSIVE")
            .csv(path))


def parse_csv_lines(lines: DataFrame, col: str, schema_ddl: str,
                    sep: str = ",") -> DataFrame:
    """CsvConverter streaming shape: parse an existing string column
    (`from_csv`, JVM-side) — for lines that arrived via another source."""
    parsed = lines.withColumn(
        "_parsed", F.from_csv(F.col(col), schema_ddl,
                              {"sep": sep, "mode": "PERMISSIVE"}))
    return parsed.select("_parsed.*")


def write_docs(df: DataFrame, path: str, fmt: str = "parquet",
               mode: str = "overwrite", **options) -> None:
    """FileWriter analog: parquet/json/csv/text sinks, one call."""
    writer = df.write.mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    getattr(writer, fmt)(path)
