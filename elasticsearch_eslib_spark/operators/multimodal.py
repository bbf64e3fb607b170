"""Multimodal columns: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as `binary`
columns with metadata, decoded/feature-extracted inside Arrow-batched
Python. The image/audio libs are not in this container, so the actual
decode is STUBBED (import-gated; deterministic fake features otherwise) —
but the Spark-side plumbing is real and tested: schema, mapInPandas batch
iteration, partition behavior.

`media_table` synthesizes a deterministic media table from `documents`
(payload = unhex(md5(text)), 16 bytes standing in for encoded media), so
the feature extractor has a stable, engine-independent input that the
DuckDB oracle can reproduce.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from elasticsearch_eslib_spark.operators.fulltext import load_documents

_MEDIA_TYPES = ["image", "audio", "video"]

FEATURE_SCHEMA = ("media_id long, media_type string, n_bytes int, "
                  "checksum long, width int, height int")


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, media_type, payload binary, src_doc) — deterministic."""
    docs = load_documents(spark, sf_dir)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(*[F.lit(t) for t in _MEDIA_TYPES]),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        F.unhex(F.md5("text")).alias("payload"),
        F.col("doc_id").alias("src_doc"))


def _decode_real(payload: bytes, media_type: str):
    """Real decode path — requires PIL/librosa/av, absent in this container."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; the deterministic fake below exercises the plumbing")


def _decode_fake(payload: bytes, media_type: str) -> tuple[int, int, int, int]:
    """Deterministic fake 'decode': byte length, md5-derived checksum and
    fake dimensions. Checksum hashes the payload's lowercase hex string
    (DuckDB md5 can't take BLOBs, so the oracle mirrors md5(hex))."""
    h = hashlib.md5(payload.hex().encode()).hexdigest()
    checksum = int(h[:15], 16)
    width = 1 + checksum % 64
    height = 1 + (checksum // 64) % 64
    return len(payload), checksum, width, height


try:  # pragma: no cover - never present in this container
    import PIL  # noqa: F401
    _HAVE_MEDIA_LIBS = True
except Exception:
    _HAVE_MEDIA_LIBS = False


def media_features(spark: SparkSession, sf_dir: str,
                   decode=None) -> DataFrame:
    """Feature-extract every media row via mapInPandas (Arrow batches).

    The decoder is chosen ON THE DRIVER and captured in the UDF closure
    (cloudpickle ships it by value), so the real-vs-fake seam is a plain
    injectable function — tests drive the `_decode_real` wiring through
    actual Spark workers by passing a stand-in decoder (see
    tests/test_pipeline_ops.py::test_media_real_decode_seam)."""
    media = media_table(spark, sf_dir)
    if decode is None:
        decode = _decode_real if _HAVE_MEDIA_LIBS else _decode_fake

    def _extract(iterator):
        for pdf in iterator:
            feats = [decode(bytes(p), t)
                     for p, t in zip(pdf["payload"], pdf["media_type"])]
            out = pd.DataFrame(feats,
                               columns=["n_bytes", "checksum", "width", "height"])
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)
