"""Local replica of the driver's Spark-vs-DuckDB compare.

Usage: python scripts/check_oracle.py [query ...]  (default: all with SQL)
Compares row count, sorted-column schema, and per-row value equality at
sf0.01 — the same signal CORRECTNESS_r{N}.json records.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main() -> int:
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from elasticsearch_eslib_spark.config import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    sqls = entry.oracle_sql()
    names = sys.argv[1:] or [n for n in qs if n in sqls]
    bad = 0
    for name in names:
        if name not in sqls:
            print(f"{name}: no oracle (rows-only) — spark rows "
                  f"{qs[name](spark, SF).count()}")
            continue
        sdf = qs[name](spark, SF).toPandas()
        odf = con.execute(sqls[name]).df()
        cols = sorted(sdf.columns)
        ocols = sorted(odf.columns)
        if cols != ocols:
            print(f"{name}: SCHEMA MISMATCH spark={cols} oracle={ocols}")
            bad += 1
            continue
        s = sdf[cols].sort_values(cols).reset_index(drop=True)
        o = odf[cols].sort_values(cols).reset_index(drop=True)
        if len(s) != len(o):
            print(f"{name}: ROWS MISMATCH spark={len(s)} oracle={len(o)}")
            bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False,
                                          check_exact=False, rtol=0, atol=1e-9)
            print(f"{name}: OK ({len(s)} rows)")
        except AssertionError as exc:
            print(f"{name}: VALUE MISMATCH — {str(exc)[:300]}")
            bad += 1
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
