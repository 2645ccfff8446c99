"""Scalar expression helpers — the reference's scalar-function surface
(SURVEY.md §2.8) re-expressed as Catalyst column expressions, plus the
shared deterministic hash the LLM-data operators build on.

Everything here is a built-in-function composition: JVM-side, codegen'd,
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def revenue(extendedprice: str | Column = "l_extendedprice", discount: str | Column = "l_discount") -> Column:
    """`l_extendedprice * (1 - l_discount)` — the Q3 revenue expression
    (reference: TPCHQuery3SQL_Batch.java:102,
    TPCHQuery3_StreamProcessor.java:503)."""
    ep = F.col(extendedprice) if isinstance(extendedprice, str) else extendedprice
    dc = F.col(discount) if isinstance(discount, str) else discount
    return ep * (F.lit(1.0) - dc)


def ts_lit(date_str: str) -> Column:
    """Date literal as TIMESTAMP_NTZ — driver testdata stores DATE
    columns as naive timestamps (FIXTURES.md §B), which Spark reads as
    TIMESTAMP_NTZ. An ntz literal keeps every comparison free of the
    session timezone (an ltz literal would be coerced through it);
    DuckDB oracle side uses ``TIMESTAMP 'yyyy-mm-dd'`` (also naive)."""
    return F.lit(date_str).cast("timestamp_ntz")


def exact_sum(col: Column, scale: int) -> Column:
    """Cross-engine-exact SUM of a fixed-point double column.

    Money/quantity columns in the testdata are doubles carrying a fixed
    number of decimals (2dp for prices, 4dp for price*(1-discount)
    products). A plain float SUM is order-dependent, so Spark and the
    DuckDB oracle can disagree in the last ulp — and post-hoc round()
    then diverges at exact .xx5 boundaries (Spark HALF_UP vs DuckDB
    half-even). Quantizing each row to integer units first makes the
    aggregation exact: round(x*scale) is unambiguous (inputs sit within
    ~1e-9 of an integer), the long SUM is associative, and the final
    rescale is a single deterministic IEEE division — bit-identical in
    both engines. SQL oracle form: `exact_sum_sql`.
    """
    return F.sum(F.round(col * scale, 0).cast("long")) / F.lit(float(scale))


def exact_sum_sql(expr: str, scale: int) -> str:
    return f"CAST(sum(CAST(round(({expr}) * {scale}) AS BIGINT)) AS BIGINT) / {float(scale)}"


def exact_avg(col: Column, scale: int) -> Column:
    """Cross-engine-exact AVG via the same quantized-sum trick."""
    return F.sum(F.round(col * scale, 0).cast("long")) / (F.lit(float(scale)) * F.count(F.lit(1)))


def exact_avg_sql(expr: str, scale: int) -> str:
    return f"CAST(sum(CAST(round(({expr}) * {scale}) AS BIGINT)) AS BIGINT) / ({float(scale)} * count(*))"


def md5_hash64(col: Column) -> Column:
    """Deterministic 60-bit non-negative hash of a string, identical in
    Spark and DuckDB.

    Spark:  conv(substring(md5(x), 1, 15), 16, 10) :: bigint
    DuckDB: CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)

    md5 is the only hash both engines share bit-for-bit; 15 hex digits
    = 60 bits, safely inside a signed 64-bit integer. This is the token
    hash under MinHash / SimHash / fingerprinting, which makes those
    operators oracle-checkable in DuckDB.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_hash64_sql(expr: str) -> str:
    """DuckDB SQL rendering of `md5_hash64` for oracle queries."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
