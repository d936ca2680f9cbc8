from kafka2clickhouse_py_streamer_spark.functions.vectors import (
    cosine,
    dot,
    l2_norm,
    to_double_vec,
    valid_emb_sql,
    valid_embeddings,
)
from kafka2clickhouse_py_streamer_spark.functions.hashing import (
    affine_bucket,
    affine_bucket_sql,
    poly_hash_sql,
    shingle_digest,
    shingle_digest_sql,
    shingles_expr,
    tokens_expr,
)

__all__ = [
    "affine_bucket",
    "affine_bucket_sql",
    "cosine",
    "dot",
    "l2_norm",
    "poly_hash_sql",
    "shingle_digest",
    "shingle_digest_sql",
    "shingles_expr",
    "to_double_vec",
    "tokens_expr",
    "valid_emb_sql",
    "valid_embeddings",
]
