"""Vector math as JVM higher-order-function Column builders.

All operations evaluate in strict index order (zip_with + sequential
aggregate) so results are bit-identical to a sequential loop — the
property the DuckDB oracle comparison (list_dot_product) relies on.
Everything stays JVM-side: no UDF, no Python on the scan path. For
64-dim float vectors at 100 TB the per-row cost is a tight loop inside
codegen; the alternative (Arrow → numpy matmul via pandas UDF) pays the
transfer and changes summation order (BLAS pairwise), breaking oracle
bit-parity — use it only when batching whole matrices is worth it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_vec(col: Column | str) -> Column:
    """array<float> → array<double> (all math happens in f64)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-order dot product of two equal-length arrays."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column | str, b: Column | str,
           a_norm: Column | str, b_norm: Column | str) -> Column:
    """Cosine similarity given precomputed norms (norms are computed
    once per row in the scan projection, not once per pair)."""
    na = F.col(a_norm) if isinstance(a_norm, str) else a_norm
    nb = F.col(b_norm) if isinstance(b_norm, str) else b_norm
    return dot(a, b) / (na * nb)


def valid_embeddings(df, dim: int, col: str = "embedding"):
    """Admission gate for vector operators: drop NULL, wrong-dimension,
    zero-norm, and NON-FINITE embeddings. Cosine is undefined for a
    zero vector (the division crashes under ANSI arithmetic), a
    short/empty array silently degrades every dot product, and a
    single NaN/Inf element poisons every downstream score — worse, it
    CRASHES the Lloyd centroid trainer driver-side (math.floor(NaN) in
    the 1e-9 quantizer). A 100 TB corpus WILL contain all of these.

    The finite check is one conjunct: ‖v‖² ∈ (0, ∞). A NaN element
    makes the sum-of-squares NaN, which fails ``< Infinity`` on BOTH
    engines (each orders NaN above +Inf); an Inf element makes it +Inf,
    which also fails. Mirrored on the oracle side by
    :func:`valid_emb_sql`."""
    c = F.col(col)
    norm2 = F.aggregate(
        to_double_vec(c), F.lit(0.0), lambda acc, x: acc + x * x
    )
    return df.filter(
        c.isNotNull()
        & (F.size(c) == dim)
        & (norm2 > 0)
        & (norm2 < F.lit(float("inf")))
    )


def valid_emb_sql(dim: int, col: str = "embedding") -> str:
    """DuckDB twin of :func:`valid_embeddings` as a WHERE fragment."""
    v = f"list_transform({col}, x -> CAST(x AS DOUBLE))"
    return (
        f"{col} IS NOT NULL AND LEN({col}) = {dim}"
        f" AND list_dot_product({v}, {v}) > 0"
        f" AND list_dot_product({v}, {v}) < CAST('Infinity' AS DOUBLE)"
    )
