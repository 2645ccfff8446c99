"""Per-key stateful symmetric stream join — the reference's
CustomerOrderJoinFunction (`TPCHQuery3_StreamProcessor.java:390-449`:
ValueState<Customer> + MapState<orderkey, Order> per custkey, probing
the opposite side on every arrival and propagating Insert/Delete)
re-expressed as an `applyInPandasWithState` operator.

This exists for design parity: the engine's *preferred* streaming path
is the IVM pipeline (`streaming/ivm.py`), which is pure distributed
joins. But when per-key custom state is genuinely required (SURVEY §7
hard-part 1), this is the Spark-native shape: keyed Arrow batches in,
explicit keyed state, weighted delta rows out.

Semantics: state per custkey holds the customer's net weight and each
order's net weight plus the join product last emitted for it. On every
micro-batch the operator applies the key's events and emits, per
orderkey, the *change* in (customer_weight × order_weight) — exactly
the insert/retract stream the reference's join emits, but batched and
order-insensitive (the signed algebra commutes, so no single-threaded
source is needed).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from query_processing_over_streaming_data_using_flink_spark.functions.scalar import ts_lit

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("custkey", T.LongType()),
        T.StructField("orderkey", T.LongType()),
        T.StructField("orderdate", T.TimestampNTZType()),
        T.StructField("w", T.LongType()),
    ]
)

# Keyed state: customer net weight + parallel arrays over orderkeys
# (the MapState equivalent; arrays because state is a fixed struct).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("cust_w", T.LongType()),
        T.StructField("orderkeys", T.ArrayType(T.LongType())),
        T.StructField("order_ws", T.ArrayType(T.LongType())),
        T.StructField("orderdates", T.ArrayType(T.LongType())),  # epoch micros
        T.StructField("emitted", T.ArrayType(T.LongType())),
    ]
)


def _join_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        cust_w, orderkeys, order_ws, orderdates, emitted = state.get
        orders = {
            ok: [w, d, e]
            for ok, w, d, e in zip(orderkeys, order_ws, orderdates, emitted)
        }
    else:
        cust_w, orders = 0, {}

    for pdf in pdfs:
        for rel, op, ok, od in zip(
            pdf["relation"], pdf["op"], pdf["orderkey"], pdf["orderdate_us"]
        ):
            if rel == "customer":
                cust_w += int(op)
            else:
                ent = orders.setdefault(int(ok), [0, int(od), 0])
                ent[0] += int(op)

    out_rows = []
    for ok, ent in orders.items():
        product = cust_w * ent[0]
        delta = product - ent[2]
        if delta != 0:
            out_rows.append((key[0], ok, ent[1], delta))
            ent[2] = product

    # Reference Delete handling clears exhausted state (`:414-423`);
    # here an entry is dead once weight and emitted product are zero.
    orders = {ok: e for ok, e in orders.items() if e[0] != 0 or e[2] != 0}
    state.update(
        (
            cust_w,
            list(orders.keys()),
            [e[0] for e in orders.values()],
            [e[1] for e in orders.values()],
            [e[2] for e in orders.values()],
        )
    )
    if out_rows:
        df = pd.DataFrame(out_rows, columns=["custkey", "orderkey", "orderdate", "w"])
        df["orderdate"] = pd.to_datetime(df["orderdate"], unit="us")
        yield df


def stateful_join_customer_orders(
    events: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1995-03-15",
) -> DataFrame:
    """Wire the stateful symmetric join over a (streaming or batch)
    changelog DataFrame: weight-preserving pre-filters (the reference's
    CustomerFilter/OrderFilter, `:347-371`), key by custkey, keyed
    state join. Returns the weighted (custkey, orderkey, orderdate, w)
    delta stream."""
    cut = ts_lit(cutoff)
    filtered = events.filter(
        ((F.col("relation") == "customer") & (F.col("mktsegment") == segment))
        | ((F.col("relation") == "orders") & (F.col("orderdate") < cut))
    ).select(
        F.when(F.col("relation") == "customer", F.col("custkey"))
        .otherwise(F.col("o_custkey"))
        .alias("join_key"),
        "relation",
        "op",
        F.coalesce("orderkey", F.lit(-1)).alias("orderkey"),
        F.coalesce(
            F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', orderdate)"),
            F.lit(0),
        ).alias("orderdate_us"),
    )
    return filtered.groupBy("join_key").applyInPandasWithState(
        _join_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# NOTE (round 2): a `transformWithState` rendering of the reference's
# IncrementalAggregateFunction (TPCHQuery3_StreamProcessor.java:516-574)
# lived here, but Spark's TWS Python worker protocol requires protobuf,
# which this container lacks (no network to vendor it either) — the code
# could never execute, so it was deleted per the round-1 review rather
# than shipped untested. The same ValueState += / -= semantics are
# exercised through `applyInPandasWithState` above and the signed-weight
# algebra in `streaming/retraction.py`; on a cluster with protobuf, TWS
# would be a mechanical re-rendering of `_join_fn`'s state dict onto
# handle.getValueState/getMapState.
