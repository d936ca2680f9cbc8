"""Banded Hamming-LSH pairing over multi-word integer fingerprints.

The shared candidate+verify core behind d06 (64-bit SimHash) and m07
(64-bit perceptual hash), factored out and parameterized by the WORD
LIST so the documented scale knob — "widen the hash when band
occupancy saturates" — is working code, not a constants edit: a
128-bit fingerprint is the same call with four 32-bit word columns
(band space 2^32 per band at 4 bands — occupancy < 1 into the
billions of distinct fingerprints), and the exactness guarantee is
pinned for the 4-word layout by tests/test_llm_invariants.py on
crafted hashes.

Design rules (each receipted in SCALE.md rounds 10-11):

- Fingerprints are carried as k NON-NEGATIVE 32-bit words in BIGINT
  columns — a single 64-bit value would overflow signed int64 at bit
  63, and every expression here must evaluate identically on Spark
  and any ANSI oracle.
- Banding runs over DISTINCT fingerprints, never doc rows: duplicate
  clusters (the dominant real corpus shape) expand at OUTPUT, never
  inside the candidate join (RECEIPT_SF10: ~13 hundred-way cliques at
  500k docs cost 94k output rows, not join blowup).
- ``n_bands`` must exceed ``hamming_max`` (pigeonhole: ≤ h differing
  bits cannot touch h+1 bands, so banding is EXACT recall at the
  verify threshold), and bands divide evenly into the words.
- The band join's equality keys are (band_id, band_val); the
  lexicographic pair-order predicate is a post-join filter, so the
  join stays a hash equi-join (pinned by the plan tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32


def banded_hamming_pairs(
    hashed: DataFrame,
    word_cols: list[str],
    n_bands: int,
    hamming_max: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """All (id_a < id_b) pairs within Hamming distance ``hamming_max``
    over the multi-word fingerprint, as ``(doc_a, doc_b, hamming)``.

    ``hashed`` must carry ``id_col`` plus ``word_cols`` (each a
    non-negative BIGINT holding 32 fingerprint bits). Candidates come
    from band collisions over DISTINCT fingerprints; identical
    fingerprints pair through a separate self-join at hamming 0."""
    n_words = len(word_cols)
    if n_bands <= hamming_max:
        raise ValueError(
            f"n_bands={n_bands} must exceed hamming_max={hamming_max} "
            "(pigeonhole exactness)"
        )
    if n_bands % n_words:
        raise ValueError(
            f"n_bands={n_bands} must divide evenly into "
            f"{n_words} words"
        )
    bands_per_word = n_bands // n_words
    if WORD_BITS % bands_per_word:
        raise ValueError(
            f"{bands_per_word} bands per word must divide "
            f"{WORD_BITS} bits"
        )
    band_bits = WORD_BITS // bands_per_word

    def band_val(j: int):
        word = F.col(word_cols[j // bands_per_word])
        return F.shiftright(
            word, (j % bands_per_word) * band_bits
        ).bitwiseAND((1 << band_bits) - 1)

    hu = hashed.select(*word_cols).distinct()
    banded = hu.select(
        *word_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_id"),
                        band_val(j).alias("band_val"),
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select(*word_cols, "b.band_id", "b.band_val")

    x = banded.alias("x")
    y = banded.alias("y")
    # lexicographic (w0, w1, ...) order as a post-join filter
    pair_order = None
    eq_prefix = None
    for w in word_cols:
        lt = F.col(f"x.{w}") < F.col(f"y.{w}")
        term = lt if eq_prefix is None else (eq_prefix & lt)
        pair_order = term if pair_order is None else (pair_order | term)
        eq = F.col(f"x.{w}") == F.col(f"y.{w}")
        eq_prefix = eq if eq_prefix is None else (eq_prefix & eq)

    a_cols = [f"{w}_a" for w in word_cols]
    b_cols = [f"{w}_b" for w in word_cols]
    hamming = None
    for wa, wb in zip(a_cols, b_cols):
        term = F.bit_count(F.col(wa).bitwiseXOR(F.col(wb)))
        hamming = term if hamming is None else (hamming + term)
    hamming = hamming.cast("long")

    hp = (
        x.join(
            y,
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & pair_order,
        )
        .select(
            *[F.col(f"x.{w}").alias(f"{w}_a") for w in word_cols],
            *[F.col(f"y.{w}").alias(f"{w}_b") for w in word_cols],
        )
        .distinct()
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= hamming_max)
    )
    cross = (
        hp.join(
            hashed.select(
                F.col(id_col).alias("id_a"),
                *[F.col(w).alias(f"{w}_a") for w in word_cols],
            ),
            a_cols,
        )
        .join(
            hashed.select(
                F.col(id_col).alias("id_b"),
                *[F.col(w).alias(f"{w}_b") for w in word_cols],
            ),
            b_cols,
        )
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
            "hamming",
        )
    )
    g1 = hashed.alias("g1")
    g2 = hashed.alias("g2")
    same_eq = F.col(f"g1.{id_col}") < F.col(f"g2.{id_col}")
    for w in word_cols:
        same_eq = (F.col(f"g1.{w}") == F.col(f"g2.{w}")) & same_eq
    same = g1.join(g2, same_eq).select(
        F.col(f"g1.{id_col}").alias("doc_a"),
        F.col(f"g2.{id_col}").alias("doc_b"),
        F.lit(0).cast("long").alias("hamming"),
    )
    return cross.unionByName(same)
