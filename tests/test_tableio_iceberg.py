"""TableIO interface contract — run against ManifestTableIO always, and
against IcebergTableIO when an Iceberg runtime jar + catalog exist (this
sandbox has neither, so the Iceberg end-to-end case SKIPS; the routing,
helper, and failure-mode paths still run)."""

import os

import pytest

from elasticsearch_eslib_spark.sources.tableio import (
    IcebergTableIO, IcebergUnavailable, ManifestTableIO,
    iceberg_available, open_tableio,
)

FP = "fp-contract-1"


def _contract(io, spark, make_df):
    """The behavior every TableIO implementation must satisfy."""
    # group commits accumulate and read() sees exactly the committed rows
    io.commit_group("tokenized", "tokenized", make_df([(1, 0), (2, 0)]),
                    [0], FP, partition_by=["bucket"])
    io.commit_group("tokenized", "tokenized", make_df([(3, 1)]),
                    [1], FP, partition_by=["bucket"])
    assert io.done_partitions("tokenized", FP) == {0, 1}
    assert io.done_partitions("tokenized", "other-fp") == set()
    got = sorted(r["doc_id"] for r in io.read("tokenized").collect())
    assert got == [1, 2, 3]

    # stage-level commit + accessors
    assert not io.is_done("tokenized", FP)
    snap = io.commit_stage("tokenized", "tokenized", None, FP,
                           metrics={"n": 3})
    assert io.is_done("tokenized", FP)
    assert not io.is_done("tokenized", "other-fp")
    assert io.stage_snapshot("tokenized") == snap
    assert io.stage_metrics("tokenized")["n"] == 3

    # whole-table overwrite write + read
    io.write_table("docs", make_df([(7, 0)]))
    assert [r["doc_id"] for r in io.read("docs").collect()] == [7]
    io.write_table("docs", make_df([(8, 0)]))
    assert [r["doc_id"] for r in io.read("docs").collect()] == [8]

    # lineage_df matches the declared schema
    from elasticsearch_eslib_spark import schemas

    ldf = io.lineage_df()
    assert ldf.schema == schemas.LINEAGE
    pids = {r["partition_id"] for r in ldf.collect()
            if r["stage"] == "tokenized"}
    assert pids == {0, 1}

    # reset drops data + lineage + stage status
    io.reset_stage("tokenized", "tokenized")
    assert io.done_partitions("tokenized", FP) == set()
    assert not io.is_done("tokenized", FP)


def _mk(spark):
    def make_df(rows):
        return spark.createDataFrame(rows, "doc_id long, bucket int")
    return make_df


def test_manifest_tableio_contract(spark, tmp_path):
    io = ManifestTableIO(spark, str(tmp_path / "man"))
    _contract(io, spark, _mk(spark))


def test_iceberg_tableio_contract(tmp_path):
    """Real Iceberg catalog end-to-end — needs the runtime jar."""
    from elasticsearch_eslib_spark.config import get_spark

    probe = get_spark("iceberg-probe", master="local[2]",
                      shuffle_partitions=2)
    try:
        probe._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        pytest.skip("iceberg-spark-runtime jar not on the classpath")
    # configure a hadoop-catalog over a temp warehouse and run the contract
    probe.stop()
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[2]")
             .appName("iceberg-contract")
             .config("spark.sql.catalog.ice",
                     "org.apache.iceberg.spark.SparkCatalog")
             .config("spark.sql.catalog.ice.type", "hadoop")
             .config("spark.sql.catalog.ice.warehouse",
                     str(tmp_path / "warehouse"))
             .getOrCreate())
    try:
        io = IcebergTableIO(spark, "iceberg://ice.contract_ns")
        _contract(io, spark, _mk(spark))
    finally:
        spark.stop()


def test_open_tableio_routing(spark, tmp_path):
    io = open_tableio(spark, str(tmp_path / "plain"))
    assert isinstance(io, ManifestTableIO)
    if not iceberg_available(spark, "nosuchcatalog"):
        with pytest.raises(IcebergUnavailable):
            open_tableio(spark, "iceberg://nosuchcatalog.ns")


def test_iceberg_bucket_codec_roundtrip():
    enc = IcebergTableIO._encode_buckets([3, 1, 2])
    assert enc == "1,2,3"
    assert IcebergTableIO._decode_buckets(enc) == {1, 2, 3}
    assert IcebergTableIO._decode_buckets("") == set()


def test_manifest_crash_window_invisible(spark, tmp_path):
    """commit_group's crash injection leaves data on disk that read()
    must NOT see, and gc_unregistered reclaims it."""
    io = ManifestTableIO(spark, str(tmp_path / "crash"))
    make_df = _mk(spark)
    io.commit_group("tokenized", "tokenized", make_df([(1, 0)]), [0], FP,
                    partition_by=["bucket"])
    with pytest.raises(Exception, match="injected crash"):
        io.commit_group("tokenized", "tokenized", make_df([(2, 1)]), [1], FP,
                        partition_by=["bucket"], crash_before_record=True)
    assert io.done_partitions("tokenized", FP) == {0}
    assert [r["doc_id"] for r in io.read("tokenized").collect()] == [1]
    on_disk = set(os.listdir(io.table_path("tokenized")))
    assert len(on_disk - io.registered_dirs("tokenized")) == 1
    io.gc_unregistered("tokenized", "tokenized")
    on_disk = set(os.listdir(io.table_path("tokenized")))
    assert on_disk == io.registered_dirs("tokenized")
