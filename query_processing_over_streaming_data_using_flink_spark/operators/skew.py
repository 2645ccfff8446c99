"""Skew-resilient equi-join via key salting.

A shuffled equi-join hashes rows to reducers by join key, so one
heavy-hitter key (one viral user, one default/null-ish sentinel, one
hot product) funnels its entire row set through a single task — the
classic 99-tasks-idle-one-task-spills shape. AQE's skew-join split
(`spark.sql.adaptive.skewJoin.enabled`, on in `session.py`) repairs
this at runtime for sort-merge joins by splitting oversized partitions;
salting is the *declarative* fix that also works where AQE can't see
(e.g. a skewed aggregation feeding the join, or a build side that must
stay un-split).

Construction (dimension join, big probe side skewed on the key):
  * probe side: add `salt = pmod(hash(entire row), B)` — deterministic
    (no rand(): retries/speculative tasks must re-derive identical
    salts), spreading each hot key over B reducers;
  * build side: explode each row into B copies, one per salt value;
  * join on (key, salt). Build side grows B-fold — salting trades
    bounded replication of the SMALL side for even distribution of the
    BIG side, so B stays a small constant (8-32).

Semantics are exactly the unsalted join (every probe row still meets
every matching build row exactly once); the registered query
`join_salted_user_nation` is oracle-checked against the plain SQL join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16

_SALT = "__salt"


def _hashable_columns(df: DataFrame) -> list[str]:
    """Columns usable as F.hash() input. Spark's hash rejects MapType
    (at any nesting depth — map iteration order is undefined, so its
    hash would be too); exclude those rather than fail the whole join."""

    def ok(dt) -> bool:
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return ok(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(ok(f.dataType) for f in dt.fields)
        return True

    return [f.name for f in df.schema.fields if ok(f.dataType)]


def salt_column(df: DataFrame, buckets: int) -> Column:
    """Deterministic per-row salt: hash of the full row content (minus
    unhashable map-typed columns). Equal duplicate rows share a salt
    (correct, marginally less spread); everything else distributes
    uniformly."""
    cols = _hashable_columns(df)
    if not cols:
        raise ValueError(
            "salted_join: probe side has no hashable columns to derive a "
            f"deterministic salt from (schema: {df.schema.simpleString()})"
        )
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(buckets)).cast("int")


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    how: str = "inner",
    buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Equi-join `probe ⋈ build` on column `on`, resilient to probe-side
    key skew. `build` must be the small side (it is replicated
    `buckets`×). Supports inner and left joins (the probe side is
    preserved; every build match appears exactly once)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    taken = set(probe.columns) | set(build.columns)
    if _SALT in taken:
        # A pre-existing __salt would silently join on the wrong thing.
        raise ValueError(
            f"salted_join: input already has a {_SALT!r} column — rename it"
        )
    p = probe.withColumn(_SALT, salt_column(probe, buckets))
    b = build.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return p.join(b, [on, _SALT], how).drop(_SALT)
