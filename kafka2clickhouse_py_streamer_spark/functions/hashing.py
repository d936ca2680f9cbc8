"""Text hashing / shingling builders shared by the dedup and text
operators.

Hashes are explicit integer arithmetic (base-31 polynomial over a fixed
char prefix) rather than engine hash functions, so Spark and the DuckDB
oracle reproduce them bit-for-bit. All builders emit SQL-expression
strings usable on BOTH engines (the dialects agree on ascii/substring/
rpad/lower/trim).
"""

from __future__ import annotations

POLY_CHARS = 8  # chars hashed (padded with 'x')
_POWS = [31 ** (POLY_CHARS - 1 - k) for k in range(POLY_CHARS)]


def poly_hash_sql(s: str) -> str:
    """Base-31 polynomial hash of the first POLY_CHARS chars of ``s``
    (an SQL expression string), as 64-bit arithmetic on both engines.
    CAST to BIGINT: 31^6 fits int32, so int*int would overflow under
    Spark's ANSI arithmetic."""
    padded = f"rpad({s}, {POLY_CHARS}, 'x')"
    terms = [
        f"CAST(ascii(substring({padded}, {k + 1}, 1)) AS BIGINT)"
        f" * {_POWS[k]}"
        for k in range(POLY_CHARS)
    ]
    return "(" + " + ".join(terms) + ")"


def tokens_expr(text_col: str = "text") -> str:
    """Spark SQL: lowercased whitespace tokens of a text column."""
    return f"split(trim(lower({text_col})), '\\\\s+')"


def shingles_expr(tokens_col: str = "tk", n: int = 3) -> str:
    """Spark SQL: distinct word-``n``-shingles from a token-array
    column. The token array must be materialized as a column first —
    inlining split() here re-evaluates the regex per element."""
    return (
        f"array_distinct(transform(sequence(1, greatest(size({tokens_col})"
        f" - {n - 1}, 1)), i -> concat_ws(' ', slice({tokens_col}, i, {n}))))"
    )


AFFINE_P = 2147483647  # modulus of the shared affine bucket family


def affine_bucket(key, j: int, width: int):
    """Row-``j`` affine bucket ``((a_j·(key%P)+b_j) % P) % width`` of a
    non-negative integer key Column, with a_j = 2j+3, b_j = 5j+1 —
    ONE hash family for every fixed-width sketch (w12's count-min
    grid, d18's Bloom positions). All operands are positive so ``%``
    agrees across engines, and a_j·(key%P)+b_j ≤ ~2e10 fits BIGINT.
    SQL twin: :func:`affine_bucket_sql`."""
    from pyspark.sql import functions as F

    a, b = 2 * j + 3, 5 * j + 1
    return ((F.lit(a) * (key % AFFINE_P) + F.lit(b)) % AFFINE_P) % width


def affine_bucket_sql(key: str, j: int, width: int) -> str:
    """The DuckDB twin of :func:`affine_bucket` (identical
    arithmetic, SQL-expression string)."""
    a, b = 2 * j + 3, 5 * j + 1
    return (
        f"((({a} * ({key} % {AFFINE_P}) + {b})"
        f" % {AFFINE_P}) % {width})"
    )


def shingle_digest(col: str = "s"):
    """60-bit shingle digest (first 15 hex chars of md5 as a BIGINT) —
    THE cross-operator shingle identity: d03/d10's verify sets, d18's
    Bloom keys, and t18's first-occurrence join must hash identically
    or their results stop being comparable. SQL twin:
    :func:`shingle_digest_sql`."""
    from pyspark.sql import functions as F

    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shingle_digest_sql(expr: str = "s") -> str:
    """The DuckDB twin of :func:`shingle_digest`."""
    return f"CAST('0x' || SUBSTRING(MD5({expr}), 1, 15) AS BIGINT)"
