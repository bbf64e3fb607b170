"""E3 two-pass dense ID assignment: determinism + density at any parallelism."""

from pyspark.sql import functions as F

from elasticsearch_eslib_spark.operators.ids import assign_dense_ids, unpersist_ids


def test_dense_ids_ordered_and_dense(spark):
    data = [(f"key{i:05d}", i * 2) for i in range(997)]
    df = spark.createDataFrame(data, "k string, v long").repartition(7)
    out = assign_dense_ids(df, "k", "id", num_partitions=5)
    rows = out.orderBy("k").collect()
    unpersist_ids(out)
    assert [r["id"] for r in rows] == list(range(1, 998))
    assert [r["k"] for r in rows] == sorted(d[0] for d in data)


def test_dense_ids_deterministic_across_partitioning(spark):
    data = [(f"u{i:04d}",) for i in range(500)]
    df = spark.createDataFrame(data, "k string")
    a = {r["k"]: r["id"] for r in
         assign_dense_ids(df.repartition(3), "k", "id", 4).collect()}
    b = {r["k"]: r["id"] for r in
         assign_dense_ids(df.repartition(11), "k", "id", 9).collect()}
    assert a == b


def test_dense_ids_single_partition(spark):
    df = spark.createDataFrame([("b",), ("a",), ("c",)], "k string")
    out = assign_dense_ids(df, "k", "id", num_partitions=1).collect()
    assert {r["k"]: r["id"] for r in out} == {"a": 1, "b": 2, "c": 3}
