"""Adversarial differential sweep: every documents-based operator runs
on a HOSTILE fixture — null text, empty/whitespace-only docs, single
tokens, astral-plane unicode (emoji), 50× repeated words, a 1000-token
document, punctuation-only and numeral-only text — and must still agree
with its DuckDB oracle exactly.

This sweep exists because it caught real bugs the friendly driver
fixtures cannot: d04's token hash overflowed INT32 on emoji code points
(ANSI crash on Spark, OutOfRange on DuckDB — both sides now CAST to
BIGINT first); the shingle family silently DISAGREED between engines on
null text (Spark produced an '' shingle, DuckDB a NULL — now pinned to
null ≡ empty via COALESCE on both sides); p11's null order key hit the
engines' opposite NULLS FIRST/LAST window defaults (now COALESCEd to a
deterministic 0.0).

Scope: operators that read ``documents`` (dedup, text, sampling
families). The t-ops' contract on null text is null-in → null-out,
which both engines share natively; the dedup/sampling contract is
null ≡ empty because their outputs feed joins and order keys where a
NULL would silently drop or reorder rows.
"""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle_harness import compare, duckdb_conn

SRC = "/root/testdata/sf0.001"

ADV_ROWS = [
    (1, None, "en", "web"),
    (2, "", "en", "web"),
    (3, "   ", "en", "web"),
    (4, "solo", "en", "books"),
    (5, "two words", "en", "books"),
    (6, "café naïve 日本語 emoji \U0001f389 test",
     "ja", "web"),
    (7, " ".join(["spam"] * 50), "en", "spamsrc"),
    (8, " ".join(f"w{i % 17}" for i in range(1000)), "en", "web"),
    (9, "!!! ??? ... ,,, ;;; :::", "en", "web"),
    (10, "123 456 789 0 42", "en", "web"),
] + [
    (10 + i, f"the quick brown fox number {i} jumps over the lazy dog",
     "en", "web")
    for i in range(1, 11)
]

# documents-reading operators; d05/m*/s* read embeddings or media,
# q*/w* read the TPC-H/events tables — out of scope here
SWEEP = [
    "d01_exact_dedup", "d02_ngram_jaccard", "d03_minhash_lsh",
    "d04_simhash", "d06_simhash_pairs", "d07_dedup_clusters",
    "d08_canonical_corpus", "d09_contamination",
    "d10_minhash_calibration", "d11_ngram_jaccard_capped",
    "d12_span_dedup", "d13_quality_canonical", "d14_lsh_admission",
    "t01_token_count", "t02_quality_score", "t03_langid",
    "t04_fingerprint", "t05_rolling_hash", "t06_repetition",
    "t07_vocab_idf", "t08_unigram_logprob", "t09_pii_scrub",
    "t10_char_entropy", "t11_readability", "t12_lexical_diversity",
    "p01_train_test_split", "p02_stratified_sample",
    "p03_sequence_packing", "p04_global_shuffle", "p05_clean_corpus",
    "p06_domain_mix", "p07_corpus_pipeline", "p08_flatten_mix",
    "p09_incremental_refresh", "p10_budget_select",
    "p11_curriculum_stages",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory) -> str:
    root = str(tmp_path_factory.mktemp("adv_sf"))
    for p in glob.glob(os.path.join(SRC, "*.parquet")):
        if os.path.basename(p) != "documents.parquet":
            shutil.copy(p, os.path.join(root, os.path.basename(p)))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in ADV_ROWS], pa.int64()),
        "text": pa.array([r[1] for r in ADV_ROWS], pa.string()),
        "lang": pa.array([r[2] for r in ADV_ROWS], pa.string()),
        "source": pa.array([r[3] for r in ADV_ROWS], pa.string()),
        "n_chars": pa.array(
            [len(r[1]) if r[1] is not None else None for r in ADV_ROWS],
            pa.int64(),
        ),
    })
    pq.write_table(tbl, os.path.join(root, "documents.parquet"))
    return root


@pytest.fixture(scope="module")
def adv_con(adv_dir):
    con = duckdb_conn(adv_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", SWEEP)
def test_adversarial_oracle_parity(spark, adv_dir, adv_con, name):
    from kafka2clickhouse_py_streamer_spark.operators.base import all_queries

    q = all_queries()[name]
    r = compare(q.fn(spark, adv_dir), adv_con, q.oracle)
    assert r.get("count_match"), (name, r)
    assert r.get("cols_match"), (name, r)
    assert r.get("values_match"), (name, r)
