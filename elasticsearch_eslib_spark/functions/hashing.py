"""Cross-engine deterministic hashing.

Dedup/minhash/simhash/fingerprint operators must produce IDENTICAL values
in Spark and in the DuckDB oracle SQL, so they share one hash: the first
15 hex digits of md5 parsed as a 60-bit non-negative integer.

  Spark : conv(substring(md5(x), 1, 15), 16, 10)::long
  DuckDB: CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)

md5 of the UTF-8 bytes of the string; both engines agree byte-for-byte.
Seeded variants prefix the input with "<seed>:" instead of doing modular
arithmetic (BIGINT multiply overflows raise in DuckDB; Spark wraps —
prefix-hashing sidesteps the divergence entirely).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MD5_HEX_DIGITS = 15  # 60 bits < 2^63: safe in both engines


def md5_long(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, MD5_HEX_DIGITS), 16, 10).cast("long")


def md5_long_seeded(col: Column | str, seed: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return md5_long(F.concat(F.lit(f"{seed}:"), c))


def sql_md5_long(expr: str) -> str:
    """DuckDB twin of md5_long for an SQL expression string."""
    return f"CAST('0x' || substring(md5({expr}), 1, {MD5_HEX_DIGITS}) AS BIGINT)"


def sql_md5_long_seeded(expr: str, seed: int) -> str:
    return sql_md5_long(f"'{seed}:' || {expr}")
