"""Distributed linear algebra over embedding columns — the gram /
covariance / PCA family a training-data pipeline needs for whitening,
drift monitoring, and spectral diagnostics at corpus scale.

Scale design (the 100 TB path):

* The gram matrix ``G = Xᵀ X`` is computed with MAP-SIDE PARTIALS: a
  `mapInPandas` pass accumulates one d×d int64 NumPy matrix per
  partition and emits it as d² long-format rows, so the only shuffle is
  ``partitions × d²`` tiny rows into a (i, j) hash aggregate — vectors
  never leave their partition and nothing is collected to the driver.
  This is the one place built-in column functions genuinely cannot
  express the computation (a per-partition outer-product accumulation),
  so it drops to an Arrow-batched pandas iterator, never per-row.
* Everything is quantized to integers before any sum (components to
  ``floor(x · 2¹⁰)``): integer adds are associative, so the result is
  bit-identical under any partitioning, engine, or retry — the same
  discipline as `ann_ivf` / `embedding_label_centroids`.
* Power iteration runs on the AGGREGATED d×d table (d² rows — KB-sized
  at any corpus scale), as chained join + groupBy steps. Per-step
  normalization divides by max|component| (order-independent, unlike an
  L2 norm whose float sum would be partition-dependent) using integer
  truncating division, which Spark's ``DIV`` and DuckDB's ``//`` agree
  on exactly.

Reference parity: the reference has no linear-algebra surface
(SURVEY §2.10) — this extends the LLM-data mandate (embedding ops)
beyond it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Component quantization: floor(x * 2^10). Unit-scale embedding
# components quantize to |q| <= 2^10, so a per-partition int64 gram
# accumulation overflows only past ~2^43 rows per partition.
Q_COMP = 1 << 10

_GRAM_SCHEMA = "i int, j int, sxy long, si long, sj long, n long, d int"


def _gram_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Accumulate one quantized int64 gram matrix (plus column sums and
    row count) across ALL Arrow batches of a partition, then emit it as
    d² long-format rows — O(d²) output per partition regardless of row
    count."""
    import numpy as np

    G = None
    s = None
    n = 0
    for pdf in batches:
        if len(pdf) == 0:
            continue
        try:
            X = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        except ValueError as e:
            raise ValueError(
                "gram_long requires a fixed-width embedding column; "
                f"got ragged or null vectors in this partition ({e})"
            ) from None
        if not np.isfinite(X).all():
            # floor(NaN).astype(int64) is INT64_MIN with only a numpy
            # warning — it would silently poison every (i, j) sum this
            # partition contributes to. Fail loudly instead.
            raise ValueError(
                "gram_long requires finite embedding components; got "
                "NaN/inf in this partition — filter or impute upstream"
            )
        Q = np.floor(X * Q_COMP).astype("int64")
        if G is None:
            G = Q.T @ Q
            s = Q.sum(axis=0)
        else:
            G += Q.T @ Q
            s += Q.sum(axis=0)
        n += len(pdf)
    if G is None:
        return
    d = G.shape[0]
    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    yield pd.DataFrame(
        {
            "i": ii.ravel().astype("int32"),
            "j": jj.ravel().astype("int32"),
            "sxy": G.ravel(),
            "si": np.repeat(s, d),
            "sj": np.tile(s, d),
            "n": np.full(d * d, n, dtype="int64"),
            # Observed embedding width: np.stack only catches ragged
            # vectors WITHIN a partition; the aggregate asserts a single
            # distinct d ACROSS partitions (internally-consistent
            # partitions of different widths would otherwise silently
            # mix dimensions).
            "d": np.full(d * d, d, dtype="int32"),
        }
    )


def gram_long(emb: DataFrame) -> DataFrame:
    """Full quantized gram statistics of an `embedding` column in long
    format: one row per (i, j) dimension pair with exact integer
    ``sxy = Σ qx_i·qx_j``, per-dimension sums ``si, sj`` and count
    ``n`` — the sufficient statistics for covariance, correlation and
    uncentered PCA in one pass."""
    parts = emb.select("embedding").mapInPandas(_gram_partials, _GRAM_SCHEMA)
    agg = parts.groupBy("i", "j").agg(
        F.sum("sxy").alias("sxy"),
        F.sum("si").alias("si"),
        F.sum("sj").alias("sj"),
        F.sum("n").alias("n"),
        # min/max (not count_distinct, which would plan a second
        # exchange) — mixed widths surface as min ≠ max.
        F.min("d").alias("_dmin"),
        F.max("d").alias("_dmax"),
    )
    # Cross-partition width guard: cell (0, 0) receives a partial from
    # EVERY non-empty partition, so mixed widths always surface as
    # _dmin ≠ _dmax there. The check lives inside sxy's expression (not
    # a droppable extra column) so Catalyst column pruning can't elide
    # it.
    return agg.select(
        "i",
        "j",
        F.when(F.col("_dmin") == F.col("_dmax"), F.col("sxy"))
        .otherwise(
            F.raise_error(
                F.lit(
                    "gram_long: partitions disagree on embedding width — "
                    "ragged corpus; fix the embedding column upstream"
                )
            ).cast("long")
        )
        .alias("sxy"),
        "si",
        "sj",
        "n",
    )


def covariance_long(emb: DataFrame) -> DataFrame:
    """Sample covariance matrix in long format (i, j, n, cov), derived
    from the one-pass gram statistics: cov = E[x_i x_j] − E[x_i]E[x_j]
    on the quantized components, de-quantized at the end. Deterministic:
    every aggregate is an integer sum."""
    g = gram_long(emb)
    q2 = float(Q_COMP * Q_COMP)
    # + 0.0 normalizes IEEE -0.0 (a tiny negative covariance rounded to
    # zero) to +0.0 — engines disagree on the zero's sign otherwise.
    return g.select(
        "i",
        "j",
        "n",
        (
            F.round(
                (
                    F.col("sxy") / F.col("n")
                    - (F.col("si") / F.col("n")) * (F.col("sj") / F.col("n"))
                )
                / q2,
                6,
            )
            + F.lit(0.0)
        ).alias("cov"),
    )


# Iteration-vector quantization (per-step renormalization target).
Q_VEC = 1 << 10


def _nonzero(col: str) -> str:
    """SQL guard for the truncating divisions: an all-zero matrix (a
    degenerate/empty-ish corpus) would make ``x DIV 0`` yield NULLs in
    non-ANSI Spark — silent NULL eigenvector rows — while DuckDB's
    ``//`` errors. Raise loudly in BOTH engines instead (the oracle's
    ``//`` already does)."""
    return (
        f"(CASE WHEN {col} = 0 THEN raise_error("
        "'power iteration: all-zero matrix (degenerate gram); "
        "nothing to normalize') "
        f"ELSE {col} END)"
    )


def _pin(df: DataFrame) -> DataFrame:
    """Materialize a KB-sized intermediate (localCheckpoint) — each
    squaring / iteration step references its input TWICE (self-join;
    value + its max), so an unpinned lineage re-evaluates the upstream
    gram 2^steps times. Pinning keeps every step O(d²) and the plan
    bounded. (The DuckDB oracle needs the same: AS MATERIALIZED.)"""
    return df.localCheckpoint(eager=True)


def _renorm(mat: DataFrame, col: str) -> DataFrame:
    """Requantize a matrix's entries to |·| <= 2¹⁰ by integer truncating
    division with its max|entry| — order-independent and identical in
    Spark ``DIV`` and DuckDB ``//``."""
    mat = _pin(mat)
    mx = mat.agg(F.max(F.abs(F.col(col))).alias("mx"))
    return mat.crossJoin(F.broadcast(mx)).select(
        "i", "j", F.expr(f"({col} * {Q_VEC}) DIV {_nonzero('mx')}").alias(col)
    )


def _matsquare(mat: DataFrame, col: str) -> DataFrame:
    """B·B on a d²-row long-format matrix: self-join on the shared
    index + (i, j) aggregate — d³ intermediate rows, KB-scale for any
    embedding width — then requantized."""
    a = mat.select(F.col("i"), F.col("j").alias("k"), F.col(col).alias("a"))
    b = mat.select(F.col("i").alias("k2"), F.col("j"), F.col(col).alias("b"))
    sq = (
        a.join(b, a["k"] == b["k2"])
        .groupBy("i", "j")
        .agg(F.sum(F.col("a") * F.col("b")).alias(col))
    )
    return _renorm(sq, col)


def power_iteration_vec(
    gram: DataFrame, iters: int = 8, squarings: int = 3
) -> DataFrame:
    """The RAW integer iterate: (dim, v, m) with v the quantized
    eigenvector component (|v| <= 2¹⁰, exact) and m the final unsquared
    matvec ``(Gn·v)_dim``. Downstream integer consumers (projections)
    MUST use this — rebuilding v from the rounded `component` of
    `power_iteration_top_eig` truncates one quantization unit."""
    return _power_iteration_raw(gram, iters, squarings)


def power_iteration_top_eig(
    gram: DataFrame, iters: int = 8, squarings: int = 3
) -> DataFrame:
    """Top eigenvector of the n-normalized quantized gram matrix,
    entirely as DataFrame ops on the d²-row gram table (every shuffle
    moves KB at any corpus scale).

    Near-isotropic corpora have a tiny spectral gap, so plain power
    iteration converges too slowly for a bounded plan — instead the
    matrix is SQUARED `squarings` times first (each squaring doubles
    the log-gap; requantized after each to keep int64 exact), then
    `iters` rounds of iteration run on the squared operator: 3+8 ≈ a
    G⁶⁴ power in 11 bounded steps. Every operation is an integer sum,
    max (order-independent), or truncating division (Spark ``DIV`` ==
    DuckDB ``//``), so the whole trajectory is engine- and
    partitioning-deterministic. Emits (dim, component, rayleigh):
    `rayleigh` is the per-dim ratio ``(Gn·v)_dim / v_dim`` against the
    ORIGINAL Gn — it approaches Gn's top eigenvalue as v converges.
    Starts from the all-ones vector (never orthogonal to the top
    eigenvector of a PSD gram)."""
    vec = power_iteration_vec(gram, iters, squarings)
    return vec.select(
        "dim",
        (F.round(F.col("v") / float(Q_VEC), 6) + F.lit(0.0)).alias("component"),
        F.when(
            F.col("v") != 0, F.round(F.col("m") / F.col("v"), 6) + F.lit(0.0)
        ).alias("rayleigh"),
    )


def _power_iteration_raw(gram: DataFrame, iters: int, squarings: int) -> DataFrame:
    # Gn = G DIV n: bounds matvec magnitudes independently of corpus
    # size, so int64 never overflows at any n.
    gn = _pin(gram.select("i", "j", F.expr("sxy DIV n").alias("gn")))
    B = _renorm(gn, "gn")
    for _ in range(squarings):
        B = _matsquare(B, "gn")
    B = _pin(B)
    v = gn.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("dim"), F.lit(Q_VEC).cast("long").alias("v")
    )
    for _ in range(iters):
        m = _pin(
            B.join(v, B["j"] == v["dim"])
            .groupBy("i")
            .agg(F.sum(F.col("gn") * F.col("v")).alias("m"))
        )
        mx = m.agg(F.max(F.abs(F.col("m"))).alias("mx"))
        v = (
            m.crossJoin(F.broadcast(mx))
            .select(
                F.col("i").alias("dim"),
                F.expr(f"(m * {Q_VEC}) DIV {_nonzero('mx')}").alias("v"),
            )
        )
    last_m = (
        gn.join(v, gn["j"] == v["dim"])
        .groupBy("i")
        .agg(F.sum(F.col("gn") * F.col("v")).alias("m"))
    )
    return v.join(last_m, v["dim"] == last_m["i"]).select("dim", "v", "m")
