"""Skew mitigation: salted joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions, but it cannot help when a
single JOIN KEY is hot — all rows for that key still meet in one task.
Salting fixes the key itself: the large side spreads each key over
``salt_n`` sub-keys, the small side replicates each row ``salt_n``
times, and the join key becomes (key, salt). Cost: small side inflates
×salt_n — use for moderate dimension tables when one fact key dominates
(the classic null-key / power-user / default-value hot spots).

The salt is deterministic (pmod of a hash of the whole large-side row's
monotonically increasing id would be non-deterministic under retry;
instead we hash stable columns), so speculative re-execution and
at-least-once replays produce identical assignments.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_large_side(
    df: DataFrame, stable_cols: list[str], salt_n: int
) -> DataFrame:
    """Assign each row a deterministic salt in [0, salt_n) from a hash
    of stable identifying columns."""
    return df.withColumn(
        SALT_COL, F.pmod(F.hash(*[F.col(c) for c in stable_cols]), F.lit(salt_n))
    )


def explode_small_side(df: DataFrame, salt_n: int) -> DataFrame:
    """Replicate every row once per salt value (×salt_n inflation)."""
    return df.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Column,
    salt_n: int = 8,
    how: str = "inner",
    large_stable_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the hot-key pressure spread over ``salt_n``
    sub-partitions. ``on`` is the ordinary join condition; the salt
    equality is added on top. Result is identical to the unsalted join
    (verified by test), minus the ``__salt`` bookkeeping column."""
    stable = large_stable_cols or large.columns
    big = salt_large_side(large, stable, salt_n)
    rep = explode_small_side(small, salt_n)
    joined = big.join(
        rep, on & (big[SALT_COL] == rep[SALT_COL]), how
    )
    return joined.drop(SALT_COL)
