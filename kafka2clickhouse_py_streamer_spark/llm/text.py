"""Text analysis over the ``documents`` table: token counting, quality
scoring, language ID (n-gram/marker-word heuristic), document
fingerprinting.

Everything is whole-stage-codegen JVM expressions (regexp_count, split,
md5) — a 100 TB corpus scan stays Python-free. Each op has an exact
DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka2clickhouse_py_streamer_spark.functions import tokens_expr
from kafka2clickhouse_py_streamer_spark.operators.base import Query, table

# Marker words per language for the heuristic language-ID scorer.
# (Checked in this precedence order; ties go to the earlier language.)
LANG_MARKERS = [
    ("en", r"\b(the|and|of|to|is)\b"),
    ("es", r"\b(el|la|los|que|de)\b"),
    ("de", r"\b(der|die|das|und|ist)\b"),
    ("fr", r"\b(le|les|des|et|est)\b"),
]

PUNCT_RE = r"[.,;:!?]"
STOPWORD_RE = r"\b(the|a|an|and|or|of|to|in|is)\b"


def t01_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + a BPE-ish subword proxy (runs of
    letters / digits / single punctuation), per document."""
    d = table(spark, sf_dir, "documents")
    trimmed = F.trim(F.col("text"))
    return d.select(
        "doc_id",
        F.when(F.length(trimmed) == 0, F.lit(0))
        .otherwise(F.size(F.split(trimmed, r"\s+")))
        .cast("long")
        .alias("n_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
        .cast("long")
        .alias("n_subwords"),
        F.length("text").cast("long").alias("n_chars_computed"),
    ).orderBy("doc_id")


T01_SQL = r"""
SELECT doc_id,
       CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                 ELSE LEN(regexp_split_to_array(TRIM(text), '\s+')) END AS BIGINT) AS n_tokens,
       CAST(LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_subwords,
       CAST(LENGTH(text) AS BIGINT) AS n_chars_computed
FROM documents
ORDER BY doc_id
"""


def quality_score_col():
    """The t02 quality heuristic as a reusable Column over ``text`` —
    ONE source of truth for every operator that ranks by quality
    (t02 itself; p10's budget selection in sampling.py). Mirrored on
    the oracle side by ``QUALITY_SCORE_SQL``."""
    n_tokens = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    )
    n_punct = F.regexp_count(F.col("text"), F.lit(PUNCT_RE))
    n_stop = F.regexp_count(F.lower(F.col("text")), F.lit(STOPWORD_RE))
    tok = n_tokens.cast("double")
    return (
        F.when((tok >= 10) & (tok <= 1000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((n_stop.cast("double") / F.greatest(tok, F.lit(1.0))) > 0.05,
                 F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when((n_punct.cast("double") / F.greatest(F.length("text").cast("double"), F.lit(1.0))) < 0.1,
                 F.lit(0.3)).otherwise(F.lit(0.0))
    )


_N_TOKENS_SQL_FRAG = (
    r"CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0"
    r" ELSE LEN(regexp_split_to_array(TRIM(text), '\s+')) END"
)
QUALITY_SCORE_SQL = rf"""(
  (CASE WHEN ({_N_TOKENS_SQL_FRAG}) BETWEEN 10 AND 1000 THEN 0.4 ELSE 0.0 END)
  + (CASE WHEN CAST(LEN(regexp_extract_all(LOWER(text), '{STOPWORD_RE}')) AS DOUBLE)
          / GREATEST(CAST(({_N_TOKENS_SQL_FRAG}) AS DOUBLE), 1.0) > 0.05
     THEN 0.3 ELSE 0.0 END)
  + (CASE WHEN CAST(LEN(regexp_extract_all(text, '{PUNCT_RE}')) AS DOUBLE)
          / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1.0) < 0.1
     THEN 0.3 ELSE 0.0 END)
)"""


def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length band + punctuation density +
    stopword ratio -> [0,1] score. Mirrors the C4/Gopher-style rule
    filters used for LLM corpus cleaning."""
    d = table(spark, sf_dir, "documents")
    n_tokens = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    )
    n_punct = F.regexp_count(F.col("text"), F.lit(PUNCT_RE))
    n_stop = F.regexp_count(F.lower(F.col("text")), F.lit(STOPWORD_RE))
    score = quality_score_col()
    return d.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_punct.cast("long").alias("n_punct"),
        n_stop.cast("long").alias("n_stopwords"),
        F.round(score, 2).alias("quality_score"),
    ).orderBy("doc_id")


T02_SQL = rf"""
WITH feats AS (
  SELECT doc_id,
         CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
              ELSE LEN(regexp_split_to_array(TRIM(text), '\s+')) END AS n_tokens,
         LEN(regexp_extract_all(text, '{PUNCT_RE}')) AS n_punct,
         LEN(regexp_extract_all(LOWER(text), '{STOPWORD_RE}')) AS n_stopwords,
         LENGTH(text) AS n_chars
  FROM documents
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_punct AS BIGINT) AS n_punct,
       CAST(n_stopwords AS BIGINT) AS n_stopwords,
       ROUND(
         (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 0.4 ELSE 0.0 END)
         + (CASE WHEN CAST(n_stopwords AS DOUBLE) / GREATEST(CAST(n_tokens AS DOUBLE), 1.0) > 0.05 THEN 0.3 ELSE 0.0 END)
         + (CASE WHEN CAST(n_punct AS DOUBLE) / GREATEST(CAST(n_chars AS DOUBLE), 1.0) < 0.1 THEN 0.3 ELSE 0.0 END),
       2) AS quality_score
FROM feats
ORDER BY doc_id
"""


def t03_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: count per-language marker hits, argmax
    with fixed precedence; no hits -> 'unk'.

    Tie-break parity note: ties on the max hit count resolve to the
    FIRST language in ``LANG_MARKERS`` order on both engines — the
    Spark ``when`` chain and the oracle's CASE arms are generated from
    the same list, so precedence is structurally identical, not
    coincidental. Reordering ``LANG_MARKERS`` changes predictions on
    tied documents (both sides together — still oracle-green)."""
    d = table(spark, sf_dir, "documents")
    lowered = F.lower(F.col("text"))
    counts = {
        lang: F.regexp_count(lowered, F.lit(pat)) for lang, pat in LANG_MARKERS
    }
    best = F.greatest(*counts.values())
    pred = F.when(best == 0, F.lit("unk"))
    for lang, _ in LANG_MARKERS:
        pred = pred.when(counts[lang] == best, F.lit(lang))
    sel = [F.col("doc_id"), F.col("lang").alias("labeled_lang"),
           pred.alias("pred_lang")]
    sel += [counts[lang].cast("long").alias(f"hits_{lang}")
            for lang, _ in LANG_MARKERS]
    return d.select(*sel).orderBy("doc_id")


def _t03_sql() -> str:
    cols = ",\n         ".join(
        f"LEN(regexp_extract_all(LOWER(text), '{pat}')) AS hits_{lang}"
        for lang, pat in LANG_MARKERS
    )
    best = "GREATEST(" + ", ".join(f"hits_{lang}" for lang, _ in LANG_MARKERS) + ")"
    whens = "\n            ".join(
        f"WHEN hits_{lang} = {best} THEN '{lang}'" for lang, _ in LANG_MARKERS
    )
    hit_cols = ", ".join(
        f"CAST(hits_{lang} AS BIGINT) AS hits_{lang}" for lang, _ in LANG_MARKERS
    )
    return f"""
WITH feats AS (
  SELECT doc_id, lang,
         {cols}
  FROM documents
)
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN {best} = 0 THEN 'unk'
            {whens}
       END AS pred_lang,
       {hit_cols}
FROM feats
ORDER BY doc_id
"""


def t04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full-text MD5 plus a normalized
    fingerprint (lowercase, collapsed whitespace) that catches
    formatting-only near-dups."""
    d = table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    return d.select(
        "doc_id",
        F.md5(F.col("text")).alias("fp_exact"),
        F.md5(norm).alias("fp_norm"),
    ).orderBy("doc_id")


T04_SQL = r"""
SELECT doc_id,
       MD5(text) AS fp_exact,
       MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS fp_norm
FROM documents
ORDER BY doc_id
"""


ROLL_BASE = 31
ROLL_MOD = 1_000_000_007
ROLL_PREFIX = 16  # chars covered by the rolling window scan


def t05_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling (Rabin-Karp-style) hash over the first ROLL_PREFIX chars
    of the normalized text: H = Σ ascii(c_k)·B^(n-1-k) mod M, built via
    aggregate() over the char positions — the per-window primitive a
    content-defined-chunking fingerprinter uses, in pure JVM exprs with
    an exact DuckDB twin (explicit mod at each step keeps every
    intermediate < 2^63 on both engines)."""
    d = table(spark, sf_dir, "documents")
    norm = "rpad(substring(regexp_replace(lower(trim(text)), '\\\\s+', ' '), 1, 16), 16, 'x')"
    expr = (
        f"aggregate(sequence(1, {ROLL_PREFIX}), CAST(0 AS BIGINT), "
        f"(acc, k) -> (acc * {ROLL_BASE} + ascii(substring({norm}, k, 1)))"
        f" % {ROLL_MOD})"
    )
    return d.select(
        "doc_id", F.expr(expr).alias("roll_hash")
    ).orderBy("doc_id")


T05_SQL = rf"""
WITH norm AS (
  SELECT doc_id,
         RPAD(SUBSTRING(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ', 'g'),
                        1, {ROLL_PREFIX}), {ROLL_PREFIX}, 'x') AS s
  FROM documents
)
SELECT doc_id,
       -- DuckDB reduce has no seed argument: the prepended 0 plays the
       -- role of Spark's CAST(0 AS BIGINT) initial accumulator
       REDUCE(list_prepend(CAST(0 AS BIGINT),
                           RANGE(1, {ROLL_PREFIX} + 1)),
              (acc, k) -> (acc * {ROLL_BASE} + ASCII(SUBSTRING(s, CAST(k AS INTEGER), 1)))
                          % {ROLL_MOD}) AS roll_hash
FROM norm
ORDER BY doc_id
"""


def t06_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signal: fraction of duplicate
    word-2-grams per document. High duplicate-2-gram fraction flags
    boilerplate / spam / templated text. All array ops on a
    materialized token column — no explode, no shuffle: one codegen'd
    scan per document."""
    d = table(spark, sf_dir, "documents")
    grams = (
        "CASE WHEN size(tk) < 2 THEN CAST(array() AS ARRAY<STRING>) "
        "ELSE transform(sequence(1, size(tk) - 1), "
        "i -> concat_ws(' ', slice(tk, i, 2))) END"
    )
    g = (
        d.select("doc_id", F.expr(tokens_expr("text")).alias("tk"))
        .select("doc_id", F.expr(grams).alias("grams"))
        .select(
            "doc_id",
            F.size("grams").cast("long").alias("n_2grams"),
            F.size(F.array_distinct("grams")).cast("long").alias("n_distinct"),
        )
    )
    dup_frac = F.when(
        F.col("n_2grams") > 0,
        F.round(
            F.lit(1.0) - F.col("n_distinct") / F.col("n_2grams"), 6
        ),
    ).otherwise(F.lit(0.0))
    return g.select(
        "doc_id", "n_2grams", "n_distinct", dup_frac.alias("dup_frac")
    ).orderBy("doc_id")


T06_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS tk
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN LEN(tk) < 2 THEN []::VARCHAR[]
              ELSE list_transform(RANGE(1, LEN(tk)),
                     i -> array_to_string(
                            list_slice(tk, CAST(i AS INTEGER),
                                       CAST(i AS INTEGER) + 1), ' '))
         END AS g
  FROM toks
)
SELECT doc_id,
       CAST(LEN(g) AS BIGINT) AS n_2grams,
       CAST(LEN(list_distinct(g)) AS BIGINT) AS n_distinct,
       CASE WHEN LEN(g) > 0
            THEN ROUND(1.0 - CAST(LEN(list_distinct(g)) AS DOUBLE) / LEN(g), 6)
            ELSE 0.0 END AS dup_frac
FROM grams
ORDER BY doc_id
"""


VOCAB_TOP = 100  # vocabulary rows reported


def t07_vocab_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with document frequencies and IDF — the term
    table behind TF-IDF quality scoring, stopword discovery, and
    tokenizer-vocab seeding. Top VOCAB_TOP terms by collection
    frequency (ties broken by token).

    Scale shape: explode to (doc, token) rows, ONE shuffle on the token
    key with partial (map-side) aggregation — exactly a distributed
    word count; the corpus-size scalar joins back as a broadcast of one
    row, and the top-k is TakeOrderedAndProject, never a global sort.
    Hot tokens (stopwords) are the skew case: the partial agg collapses
    them per-partition before the shuffle, so the reducer sees at most
    |partitions| rows per token, not |occurrences|."""
    d = table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.expr(tokens_expr("text"))).alias("token"))
        .filter(F.length("token") > 0)
    )
    vocab = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.countDistinct("doc_id").cast("long").alias("df"),
    )
    total = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    return (
        vocab.crossJoin(F.broadcast(total))
        .select(
            "token",
            "tf",
            "df",
            F.round(F.log(F.col("n_docs") / F.col("df")), 6).alias("idf"),
        )
        .orderBy(F.desc("tf"), "token")
        .limit(VOCAB_TOP)
    )


T07_SQL = rf"""
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS token
  FROM documents
),
vocab AS (
  SELECT token,
         CAST(COUNT(*) AS BIGINT) AS tf,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks
  WHERE LENGTH(token) > 0
  GROUP BY token
)
SELECT token, tf, df,
       ROUND(LN((SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) / df), 6)
         AS idf
FROM vocab
ORDER BY tf DESC, token
LIMIT {VOCAB_TOP}
"""


def t08_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring with a corpus-trained unigram
    LM (the CCNet-style filter, with the LM trained on the corpus
    itself): score(doc) = mean over its tokens of ln p(token), where
    p(token) = corpus_count(token) / corpus_tokens. Low scores flag
    rare-token gibberish; high scores flag stopword soup.

    Scale shape: ln(c/T) = ln c − ln T, so the corpus-total constant T
    shifts AFTER the per-doc mean — the big (doc, token) stream only
    ever joins the vocab table on the token key (count-collapsed by
    partial aggs; at 100 TB the vocab is millions of rows, a normal
    shuffle join) and the one-row ln T broadcast touches the already
    per-doc aggregated result, not the token stream."""
    d = table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.expr(tokens_expr("text"))).alias("token"))
        .filter(F.length("token") > 0)
    )
    vocab = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    per_doc = (
        toks.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.avg(F.log("c")).alias("avg_ln_count"),
        )
    )
    # corpus token total = sum of the vocab counts: aggregating the
    # already-collapsed vocab frame (whose shuffle Spark reuses for the
    # join probe) avoids a third scan+explode of the corpus
    total = vocab.agg(F.sum("c").alias("t"))
    return (
        per_doc.crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("avg_ln_count") - F.log("t"), 6).alias("avg_logp"),
        )
        .orderBy("doc_id")
    )


T08_SQL = r"""
WITH toks AS (
  SELECT doc_id, token
  FROM (SELECT doc_id,
               UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS token
        FROM documents)
  WHERE LENGTH(token) > 0
),
vocab AS (
  SELECT token, CAST(COUNT(*) AS DOUBLE) AS c FROM toks GROUP BY token
),
per_doc AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         AVG(LN(v.c)) AS avg_ln_count
  FROM toks t JOIN vocab v ON v.token = t.token
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens,
       ROUND(avg_ln_count - LN((SELECT CAST(COUNT(*) AS DOUBLE) FROM toks)), 6)
         AS avg_logp
FROM per_doc
ORDER BY doc_id
"""


# PII patterns shared by both engines. Java regex and RE2 agree on this
# subset (character classes, bounded repeats, \b word boundaries — no
# backreferences or lookaround, which RE2 lacks).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The redaction transformation itself, factored out of the t09
    query: replace emails / phones / IPv4 in ``text_col`` with typed
    placeholders and add per-pattern removal counts.

    Pure projection — whole-stage-codegen JVM regexes, zero shuffles,
    zero Python — so it is valid on batch AND streaming DataFrames
    unchanged (``streaming.corpus_stream.scrub_stream`` applies it
    under ``readStream``; the twin test proves micro-batch output
    equals batch output over any cut).
    """
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), PII_EMAIL_RE, "<EMAIL>"),
            PII_PHONE_RE,
            "<PHONE>",
        ),
        PII_IP_RE,
        "<IP>",
    )
    return df.select(
        *[c for c in df.columns if c != text_col],
        redacted.alias("clean_text"),
        F.regexp_count(F.col(text_col), F.lit(PII_EMAIL_RE))
        .cast("long")
        .alias("n_emails"),
        F.regexp_count(F.col(text_col), F.lit(PII_PHONE_RE))
        .cast("long")
        .alias("n_phones"),
        F.regexp_count(F.col(text_col), F.lit(PII_IP_RE))
        .cast("long")
        .alias("n_ips"),
    )


def t09_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: replace emails / phone numbers / IPv4 addresses
    with typed placeholders and count what was removed. The fixture
    corpus has no PII, so the query first synthesizes an annotated text
    column deterministically from (doc_id, source) — identically in the
    DuckDB oracle — so every pattern actually fires.

    Scale shape: one pure-projection scan (regexp_replace/regexp_count
    are whole-stage-codegen JVM expressions), zero shuffles, zero
    Python. This is the pre-training scrub pass a corpus pipeline runs
    before tokenization.
    """
    d = table(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    annotated = F.concat(
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("contact user"), sid, F.lit("@example.com now ")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("call 555-123-"),
                (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
                F.lit(" "),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit("from 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".0."),
                (F.col("doc_id") % 100).cast("string"),
                F.lit(" "),
            ),
        ).otherwise(F.lit("")),
        F.col("text"),
    )
    a = d.select("doc_id", annotated.alias("annotated"))
    return scrub_pii(a, "annotated").orderBy("doc_id")


T09_SQL = r"""
WITH annotated AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 3 = 0
               THEN 'contact user' || CAST(doc_id AS VARCHAR) || '@example.com now '
               ELSE '' END)
         || (CASE WHEN doc_id % 4 = 0
                  THEN 'call 555-123-' || CAST(1000 + doc_id % 9000 AS VARCHAR) || ' '
                  ELSE '' END)
         || (CASE WHEN doc_id % 5 = 0
                  THEN 'from 10.' || CAST(doc_id % 256 AS VARCHAR)
                       || '.0.' || CAST(doc_id % 100 AS VARCHAR) || ' '
                  ELSE '' END)
         || text AS annotated
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(annotated,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS clean_text,
       CAST(LEN(regexp_extract_all(annotated,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
       CAST(LEN(regexp_extract_all(annotated,
         '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
       CAST(LEN(regexp_extract_all(annotated,
         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips
FROM annotated
ORDER BY doc_id
"""


def t10_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram Shannon entropy per document — the
    gibberish / compressibility detector: natural prose sits in a
    mid-entropy band, keyboard mash and repeated boilerplate fall
    below it, random bytes above. Complements t02's rule-based score
    with an information-theoretic one.

    Entropy is computed from integer trigram counts via
    ``log2(n) - Σ c·log2(c) / n`` so both engines aggregate identical
    integers; the single float rounding (4 dp) absorbs libm ulp
    differences.

    Scale shape: explode trigrams (|chars| rows of (doc_id, 3 chars))
    → partial+final count agg on (doc_id, trigram) → per-doc agg.
    Two hash shuffles keyed by doc_id±trigram, both map-side
    combinable; no Python anywhere."""
    d = table(spark, sf_dir, "documents")
    tris = d.select(
        "doc_id",
        F.explode(
            F.expr(
                # guard: Spark's sequence(1, 0) yields a DESCENDING
                # [1, 0], not empty — short docs must get array()
                "CASE WHEN length(text) >= 3 THEN "
                "transform(sequence(1, length(text) - 2), "
                "i -> substring(text, i, 3)) "
                "ELSE array() END"
            )
        ).alias("tri"),
    )
    cnt = tris.groupBy("doc_id", "tri").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c")
    ent = cnt.groupBy("doc_id").agg(
        n.cast("long").alias("n_trigrams"),
        F.round(
            F.log2(n) - F.sum(F.col("c") * F.log2("c")) / n, 4
        ).alias("trigram_entropy"),
    )
    return (
        d.select("doc_id")
        .join(ent, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_trigrams", F.lit(0).cast("long")).alias(
                "n_trigrams"
            ),
            F.coalesce("trigram_entropy", F.lit(0.0)).alias(
                "trigram_entropy"
            ),
        )
        .orderBy("doc_id")
    )


T10_SQL = """
WITH idx AS (
  SELECT doc_id, text,
         UNNEST(generate_series(1, GREATEST(LENGTH(text) - 2, 0))) AS i
  FROM documents
),
cnt AS (
  SELECT doc_id, substr(text, i, 3) AS tri, COUNT(*) AS c
  FROM idx GROUP BY doc_id, tri
),
ent AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_trigrams,
         ROUND(LOG2(SUM(c)) - SUM(c * LOG2(c)) / SUM(c), 4)
           AS trigram_entropy
  FROM cnt GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(e.n_trigrams, 0) AS n_trigrams,
       COALESCE(e.trigram_entropy, 0.0) AS trigram_entropy
FROM documents d LEFT JOIN ent e ON e.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def t11_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease with a vowel-group syllable proxy: 206.835
    - 1.015*(words/sentences) - 84.6*(syllables/words). Sentence count
    = terminal-punctuation runs (min 1); syllables = [aeiouy]+ groups —
    the standard cheap approximation when no dictionary is shippable.
    Complements t02's rule score with a continuous readability axis for
    corpus quality stratification.

    Scale shape: pure projection, three codegen'd regex counts per row,
    zero shuffles, zero Python — same cost class as t01/t02.
    """
    d = table(spark, sf_dir, "documents")
    trimmed = F.trim(F.col("text"))
    n_words = (
        F.when(F.length(trimmed) == 0, F.lit(0))
        .otherwise(F.size(F.split(trimmed, r"\s+")))
        .cast("long")
    )
    n_sentences = F.greatest(
        F.lit(1), F.regexp_count(F.col("text"), F.lit(r"[.!?]+"))
    ).cast("long")
    n_syllables = F.regexp_count(
        F.lower(F.col("text")), F.lit(r"[aeiouy]+")
    ).cast("long")
    w = n_words.cast("double")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (w / n_sentences.cast("double"))
        - F.lit(84.6) * (n_syllables.cast("double") / w)
    )
    # floor(x*100 + 0.5)/100, NOT round(x, 2): the score lands exactly
    # on .xx5 boundaries (85.165 at sf0.1) where engine rounding modes
    # disagree; explicit floor arithmetic is bit-identical on both.
    rounded = F.floor(flesch * 100 + F.lit(0.5)) / 100
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syllables.alias("n_syllables"),
        F.when(n_words == 0, F.lit(None).cast("double"))
        .otherwise(rounded)
        .alias("flesch_score"),
    ).orderBy("doc_id")


T11_SQL = r"""
WITH feats AS (
  SELECT doc_id,
         CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
              ELSE LEN(regexp_split_to_array(TRIM(text), '\s+')) END AS BIGINT)
           AS n_words,
         CAST(GREATEST(1, LEN(regexp_extract_all(text, '[.!?]+'))) AS BIGINT)
           AS n_sentences,
         CAST(LEN(regexp_extract_all(LOWER(text), '[aeiouy]+')) AS BIGINT)
           AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CASE WHEN n_words = 0 THEN NULL
            ELSE FLOOR((206.835
                       - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                       - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))
                       * 100 + 0.5) / 100
       END AS flesch_score
FROM feats
ORDER BY doc_id
"""


def t12_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity profile per document: type-token ratio, hapax
    fraction (words occurring exactly once), and mean word length.
    Low TTR / low hapax flags template spam and generated boilerplate;
    extreme mean word length flags codey or mashed text. Together with
    t02 (rules), t08 (LM) and t10 (entropy) this completes the standard
    quality-signal quartet used for corpus stratification.

    Scale shape: same as t10 — explode words, partial+final count agg on
    (doc_id, word) [map-side combinable], then a per-doc agg; two hash
    shuffles, everything whole-stage-codegen JVM, no Python.
    """
    d = table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(
            F.when(
                F.length(F.trim("text")) == 0, F.array()
            ).otherwise(F.split(F.lower(F.trim("text")), r"\s+"))
        ).alias("word"),
    ).filter(F.col("word") != "")
    cnt = words.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).alias("c")
    )
    n = F.sum("c")
    per_doc = cnt.groupBy("doc_id").agg(
        n.cast("long").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
        F.round(F.count(F.lit(1)) / n, 4).alias("ttr"),
        F.round(
            F.sum(F.col("c") * F.length("word")) / n, 4
        ).alias("mean_word_len"),
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0).cast("long")).alias("n_words"),
            F.coalesce("n_types", F.lit(0).cast("long")).alias("n_types"),
            F.coalesce("n_hapax", F.lit(0).cast("long")).alias("n_hapax"),
            F.coalesce("ttr", F.lit(0.0)).alias("ttr"),
            F.coalesce("mean_word_len", F.lit(0.0)).alias("mean_word_len"),
        )
        .orderBy("doc_id")
    )


T12_SQL = r"""
WITH words AS (
  SELECT doc_id,
         UNNEST(regexp_split_to_array(LOWER(TRIM(text)), '\s+')) AS word
  FROM documents
),
cnt AS (
  SELECT doc_id, word, COUNT(*) AS c
  FROM words WHERE word <> '' GROUP BY doc_id, word
),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_words,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
         ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 4) AS ttr,
         ROUND(CAST(SUM(c * LENGTH(word)) AS DOUBLE) / SUM(c), 4)
           AS mean_word_len
  FROM cnt GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_words, 0) AS n_words,
       COALESCE(p.n_types, 0) AS n_types,
       COALESCE(p.n_hapax, 0) AS n_hapax,
       COALESCE(p.ttr, 0.0) AS ttr,
       COALESCE(p.mean_word_len, 0.0) AS mean_word_len
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def t14_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy scoring with a corpus-trained BIGRAM LM — the
    sharper sibling of t08's unigram filter: score(doc) = mean over its
    bigrams of ln p(w2|w1) = ln c(w1,w2) − ln c(w1). Templated/repeated
    text scores high, token-salad gibberish scores low even when its
    unigrams are common (the failure t08 can't see).

    Scale shape: the conditional is attached to the BIGRAM VOCAB first
    (a vocab-sized equi-join of bigram counts to unigram counts), so
    the big (doc, bigram) stream pays exactly ONE join against the
    scored vocab. The tokenize/explode subtree is re-derived by
    Catalyst for its three consumers (bigram stream twice, unigram
    count once) — as with d03's signature frame, recompute beats
    materializing at fixture scale, while a 100 TB deployment would
    persist the bigram stream (or write a signatures table) at that
    seam. All hash aggs take map-side combine; everything is JVM
    codegen."""
    d = table(spark, sf_dir, "documents")
    tk = d.select("doc_id", F.expr(tokens_expr("text")).alias("tk"))
    bigram_list = F.expr(
        "CASE WHEN size(tk) >= 2 THEN transform(sequence(1, size(tk) - 1),"
        " i -> struct(element_at(tk, i) AS w1, element_at(tk, i + 1) AS w2))"
        " ELSE array() END"
    )
    bg = (
        tk.select("doc_id", F.explode(bigram_list).alias("b"))
        .select("doc_id", "b.w1", "b.w2")
        .filter((F.length("w1") > 0) & (F.length("w2") > 0))
    )
    uni = (
        tk.select(F.explode("tk").alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("double").alias("c1"))
    )
    big = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("c2")
    )
    scored_vocab = big.join(uni, big.w1 == uni.token).select(
        "w1", "w2", (F.log("c2") - F.log("c1")).alias("lp")
    )
    return (
        bg.join(scored_vocab, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg("lp"), 6).alias("avg_logp"),
        )
        .orderBy("doc_id")
    )


T14_SQL = r"""
WITH tk AS (
  SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS tk
  FROM documents
),
bg AS (
  SELECT doc_id, b[1] AS w1, b[2] AS w2
  FROM (
    SELECT doc_id,
           UNNEST(CASE WHEN len(tk) >= 2
                  THEN list_transform(generate_series(1, len(tk) - 1),
                                      i -> [tk[i], tk[i + 1]])
                  ELSE [] END) AS b
    FROM tk
  )
  WHERE LENGTH(b[1]) > 0 AND LENGTH(b[2]) > 0
),
uni AS (
  SELECT token, CAST(COUNT(*) AS DOUBLE) AS c1
  FROM (SELECT UNNEST(tk) AS token FROM tk)
  WHERE LENGTH(token) > 0
  GROUP BY token
),
big AS (
  SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c2
  FROM bg GROUP BY w1, w2
),
scored AS (
  SELECT big.w1, big.w2, LN(big.c2) - LN(uni.c1) AS lp
  FROM big JOIN uni ON uni.token = big.w1
)
SELECT bg.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(s.lp), 6) AS avg_logp
FROM bg JOIN scored s ON s.w1 = bg.w1 AND s.w2 = bg.w2
GROUP BY bg.doc_id
ORDER BY bg.doc_id
"""


ZIPF_TOP = 100


def t13_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit per source: the OLS slope of ln(frequency) against
    ln(rank) over each source's top-``ZIPF_TOP`` terms. Natural text
    sits near slope −1; gibberish, boilerplate, and templated spam
    flatten or steepen the curve — a corpus-level linguistic-health
    gauge next to the per-document scorers (t02/t08/t10).

    Scale shape: explode → ONE token-key hash agg with map-side
    combine (a word count), a per-source rank window over the
    AGGREGATED vocab (never raw tokens), then regr_* moment aggregates
    per source. At 100 TB the per-source vocab sort is the cost center
    — a deployment would pre-prune with an approximate per-partition
    top-k before the window; the fixture-scale form keeps the exact
    rank for oracle parity."""
    d = table(spark, sf_dir, "documents")
    toks = (
        d.select("source", F.explode(F.expr(tokens_expr("text"))).alias("token"))
        .filter(F.length("token") > 0)
    )
    vocab = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    w = Window.partitionBy("source").orderBy(F.desc("tf"), "token")
    ranked = vocab.withColumn("rank", F.row_number().over(w))
    y = F.when(F.col("rank") <= ZIPF_TOP, F.log(F.col("tf").cast("double")))
    x = F.when(F.col("rank") <= ZIPF_TOP, F.log(F.col("rank").cast("double")))
    return (
        ranked.groupBy("source")
        .agg(
            F.round(F.regr_slope(y, x), 4).alias("zipf_slope"),
            F.round(F.regr_r2(y, x), 4).alias("zipf_r2"),
            F.count(F.lit(1)).cast("long").alias("n_vocab"),
            F.min(F.when(F.col("rank") == 1, F.col("token"))).alias(
                "top_token"
            ),
        )
        .orderBy("source")
    )


T13_SQL = rf"""
WITH toks AS (
  SELECT source,
         UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS token
  FROM documents
),
vocab AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE LENGTH(token) > 0
  GROUP BY source, token
),
ranked AS (
  SELECT source, token, tf,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY tf DESC, token) AS rank
  FROM vocab
)
SELECT source,
       ROUND(regr_slope(CASE WHEN rank <= {ZIPF_TOP}
                             THEN LN(CAST(tf AS DOUBLE)) END,
                        CASE WHEN rank <= {ZIPF_TOP}
                             THEN LN(CAST(rank AS DOUBLE)) END), 4)
         AS zipf_slope,
       ROUND(regr_r2(CASE WHEN rank <= {ZIPF_TOP}
                          THEN LN(CAST(tf AS DOUBLE)) END,
                     CASE WHEN rank <= {ZIPF_TOP}
                          THEN LN(CAST(rank AS DOUBLE)) END), 4)
         AS zipf_r2,
       CAST(COUNT(*) AS BIGINT) AS n_vocab,
       MIN(CASE WHEN rank = 1 THEN token END) AS top_token
FROM ranked
GROUP BY source
ORDER BY source
"""


def t15_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., LREC 2020):
    documents split into head/middle/tail by LM score thresholds —
    the standard pretraining-data triage that keeps the cleanest third
    and lets a curriculum (p11) or mixture (p12) weight the rest.
    t14's corpus-trained bigram avg-logprob is the perplexity proxy
    (higher = more predictable = cleaner under this LM).

    Deliberately THRESHOLD bucketing, not a global NTILE: an ntile
    window over all docs is a SinglePartition funnel — the cut points
    are instead a ONE-ROW exact-percentile aggregate (1/3 and 2/3,
    rounded to 1e-9 on both engines so interpolation FP noise cannot
    flip a boundary doc) broadcast back to a row-local CASE. At 100 TB
    the same plan holds with approx percentiles; ties at a cut land in
    the higher bucket on both engines (>= comparisons), so buckets are
    equal-count only up to ties — the scalable semantics."""
    scored = t14_bigram_logprob(spark, sf_dir)
    # CAST(... AS DOUBLE)/3, NOT 1.0/3: Spark parses 1.0 as DECIMAL,
    # so 2.0/3 becomes the 6-digit 0.666667 and the percentile rank
    # shifts by 5e-6 — enough to interpolate against the WRONG
    # neighbor and flip a boundary doc (caught by the adversarial
    # sweep). Both engines now divide doubles.
    cuts = scored.agg(
        F.round(
            F.expr("percentile(avg_logp, CAST(1 AS DOUBLE)/3)"), 9
        ).alias("cut_lo"),
        F.round(
            F.expr("percentile(avg_logp, CAST(2 AS DOUBLE)/3)"), 9
        ).alias("cut_hi"),
    )
    bucket = (
        F.when(F.col("avg_logp") >= F.col("cut_hi"), F.lit("head"))
        .when(F.col("avg_logp") >= F.col("cut_lo"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            "n_bigrams",
            "avg_logp",
            bucket.alias("ppl_bucket"),
        )
        .orderBy("doc_id")
    )


T15_SQL = f"""
WITH scored AS ({T14_SQL}),
cuts AS (
  SELECT ROUND(quantile_cont(avg_logp, CAST(1 AS DOUBLE)/3), 9) AS cut_lo,
         ROUND(quantile_cont(avg_logp, CAST(2 AS DOUBLE)/3), 9) AS cut_hi
  FROM scored
)
SELECT doc_id, n_bigrams, avg_logp,
       CASE WHEN avg_logp >= cut_hi THEN 'head'
            WHEN avg_logp >= cut_lo THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM scored, cuts
ORDER BY doc_id
"""


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("join", "spark", "window")  # kept sorted: the per-term
# contributions sum in this fixed order on BOTH engines (pivoted
# columns, not a GROUP BY SUM whose FP accumulation order the engine
# chooses — the s13 ADC lesson)


def t16_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (Robertson/Spärck Jones; Lucene's
    always-positive idf variant ln(1 + (N−df+0.5)/(df+0.5))) for a
    fixed query-term set — the LEXICAL retrieval leg next to the
    s-family's vector legs (s16 fuses the two). Top-10 documents among
    those matching ≥1 term, ranked by (score desc, doc_id).

    Scale shape: doc length is ROW-LOCAL — size() of the non-empty
    token array in the scan projection (round 6; this used to be a
    corpus-wide token explode + groupBy whose shuffle carried every
    token of every doc — the sf1 probe's growing stage for t16), so
    the length join ships 2 longs per doc. The tf side filters the
    token ARRAY to the query terms before exploding, so only matching
    tokens are ever exploded — the inverted-list probe, not a
    corpus-wide score. df/idf (|terms| rows) and the one-row N/avgdl
    frame broadcast back; avgdl is an exact integer SUM divided by
    COUNT on both engines (never an engine-accumulated AVG). Top-10 is
    TakeOrderedAndProject; the rank window runs on the 10-row
    result."""
    d = table(spark, sf_dir, "documents")
    nonempty = f"filter({tokens_expr('text')}, x -> length(x) > 0)"
    dl = d.select(
        "doc_id",
        F.expr(f"size({nonempty})").cast("long").alias("dl"),
    ).filter(F.col("dl") > 0)
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    terms_in = ", ".join(f"'{t}'" for t in BM25_QUERY)
    tf = (
        d.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"filter({tokens_expr('text')},"
                    f" x -> x IN ({terms_in}))"
                )
            ).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = (
        idf
        * F.col("tf")
        * (BM25_K1 + 1.0)
        / (
            F.col("tf")
            + BM25_K1
            * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    pivoted = scored.groupBy("doc_id").agg(
        *[
            F.max(
                F.when(F.col("tok") == t, contrib)
            ).alias(f"c_{t}")
            for t in BM25_QUERY
        ]
    )
    score = None
    for t in BM25_QUERY:
        term = F.coalesce(F.col(f"c_{t}"), F.lit(0.0))
        score = term if score is None else score + term
    top = (
        pivoted.select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(10)
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return top.withColumn(
        "rk", F.row_number().over(w).cast("long")
    ).orderBy("rk")


def _t16_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    pivots = ",\n         ".join(
        f"MAX(CASE WHEN tok = '{t}' THEN contrib END) AS c_{t}"
        for t in BM25_QUERY
    )
    score = " + ".join(f"COALESCE(c_{t}, 0.0)" for t in BM25_QUERY)
    return rf"""
WITH tk AS (
  SELECT doc_id, tok
  FROM (SELECT doc_id,
               UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '\s+'))
                 AS tok
        FROM documents)
  WHERE LENGTH(tok) > 0
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tk GROUP BY doc_id),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM tk WHERE tok IN ({terms})
  GROUP BY doc_id, tok
),
dfreq AS (
  SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY tok
),
contribs AS (
  SELECT t.doc_id, t.tok,
         LN(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
         * t.tf * ({BM25_K1} + 1.0)
         / (t.tf + {BM25_K1}
            * (1.0 - {BM25_B} + {BM25_B} * d.dl / s.avgdl)) AS contrib
  FROM tf t
  JOIN dfreq f ON f.tok = t.tok
  JOIN dl d ON d.doc_id = t.doc_id
  CROSS JOIN stats s
),
pivoted AS (
  SELECT doc_id,
         {pivots}
  FROM contribs GROUP BY doc_id
),
ranked AS (
  SELECT doc_id, ROUND({score}, 6) AS bm25
  FROM pivoted
)
SELECT doc_id, bm25,
       CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC)
            AS BIGINT) AS rk
FROM (SELECT * FROM ranked ORDER BY bm25 DESC, doc_id ASC LIMIT 10)
ORDER BY rk
"""


CHUNK_SIZE = 32  # tokens per passage
CHUNK_STRIDE = 24  # overlap = CHUNK_SIZE - CHUNK_STRIDE = 8 tokens


def chunk_passages(docs: DataFrame) -> DataFrame:
    """The t17 transformation over any (doc_id, text) frame — a pure
    stateless projection+explode, so the SAME code runs under
    readStream (twin-tested in tests/test_streaming.py). No ordering
    is applied here; t17 adds the presentation sort for the batch
    registry form."""
    base = docs.select(
        "doc_id", F.expr(tokens_expr("text")).alias("t")
    ).filter(F.length(F.trim("text")) > 0)
    n = F.size("t")
    k_chunks = F.when(n <= CHUNK_SIZE, F.lit(1)).otherwise(
        F.lit(1)
        + F.expr(
            f"(size(t) - {CHUNK_SIZE} + {CHUNK_STRIDE} - 1)"
            f" div {CHUNK_STRIDE}"
        )
    )
    chunks = base.select(
        "doc_id",
        "t",
        n.alias("n"),
        F.explode(
            F.sequence(F.lit(0), k_chunks - 1)
        ).alias("chunk_id"),
    )
    start = F.lit(1) + F.col("chunk_id") * CHUNK_STRIDE
    clen = F.least(F.lit(CHUNK_SIZE), F.col("n") - start + 1)
    body = F.concat_ws(" ", F.slice("t", start, clen))
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("start_pos"),
        clen.cast("long").alias("n_chunk_tokens"),
        F.md5(body).alias("chunk_fp"),
    )


def t17_chunk_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window passage chunking — the retrieval-prep staple
    (RAG indexing, long-document embedding): each document's token
    stream becomes overlapping CHUNK_SIZE-token passages at
    CHUNK_STRIDE intervals, with per-chunk token spans and content
    fingerprints. Chunk count is 1 for docs ≤ CHUNK_SIZE tokens, else
    1 + ceil((n − size)/stride) — the final chunk clips at the
    document end, so every token is covered and no degenerate chunk
    fully inside the previous one is emitted. The ceil uses integer
    ``div`` (Spark) / ``//`` (DuckDB): CAST would round on one engine
    and truncate on the other.

    Scale shape: pure row-local arithmetic + one explode (output is
    ~n/stride rows per doc, linear); no join, no aggregate — the only
    exchange is the presentation sort, so a 100 TB corpus chunks at
    scan speed (and the same `chunk_passages` projection runs
    unchanged under readStream)."""
    return chunk_passages(table(spark, sf_dir, "documents")).orderBy(
        "doc_id", "chunk_id"
    )


T17_SQL = rf"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS t
  FROM documents WHERE LENGTH(TRIM(text)) > 0
),
sized AS (
  SELECT doc_id, t, LEN(t) AS n,
         CASE WHEN LEN(t) <= {CHUNK_SIZE} THEN 1
              ELSE 1 + (LEN(t) - {CHUNK_SIZE} + {CHUNK_STRIDE} - 1)
                       // {CHUNK_STRIDE}
         END AS k_chunks
  FROM base
),
chunks AS (
  SELECT doc_id, t, n,
         UNNEST(generate_series(0, k_chunks - 1)) AS chunk_id
  FROM sized
)
SELECT doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(1 + chunk_id * {CHUNK_STRIDE} AS BIGINT) AS start_pos,
       CAST(LEAST({CHUNK_SIZE}, n - (1 + chunk_id * {CHUNK_STRIDE}) + 1)
            AS BIGINT) AS n_chunk_tokens,
       MD5(array_to_string(
         t[(1 + chunk_id * {CHUNK_STRIDE}) :
           (chunk_id * {CHUNK_STRIDE}
            + LEAST({CHUNK_SIZE}, n - (1 + chunk_id * {CHUNK_STRIDE}) + 1))],
         ' ')) AS chunk_fp
FROM chunks
ORDER BY doc_id, chunk_id
"""


def t18_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    word-3-shingles FIRST introduced by that doc (min doc_id over the
    whole corpus) — the soft-dedup curation signal: low novelty means
    the doc mostly recombines already-seen text even when no single
    near-dup pair fires, which is exactly what repeated boilerplate
    looks like before d02/d03 thresholds trip.

    Scale shape: first-occurrence is one count-only hash aggregate on
    the 60-bit shingle digest (min doc_id per digest — no pair join,
    d12's class), re-joined to the per-doc digest stream on the digest
    key; 8-byte digests cross the wire, never shingle strings. Two
    aggs + one equi-join, linear in corpus shingles."""
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        _shingle_rows,
    )

    from kafka2clickhouse_py_streamer_spark.functions import (
        shingle_digest,
    )

    sh = _shingle_rows(spark, sf_dir).select(
        "doc_id", shingle_digest("s").alias("hs")
    )
    # first-occurrence as a window MIN over the digest key instead of
    # groupBy + join-back — the join form evaluated the shingle
    # explode twice, once per side (round 13, the d14 rewrite); one
    # digest-keyed exchange, same rows
    from pyspark.sql.window import Window

    first_doc = F.min("doc_id").over(Window.partitionBy("hs"))
    return (
        sh.withColumn("first_doc", first_doc)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias(
                "novelty"
            ),
        )
        .orderBy("doc_id")
    )


def _t18_sql() -> str:
    from kafka2clickhouse_py_streamer_spark.functions import (
        shingle_digest_sql,
    )
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        _DUCK_SHINGLES_CTE,
    )

    return f"""
WITH {_DUCK_SHINGLES_CTE},
hashed AS (
  SELECT doc_id, {shingle_digest_sql('s')} AS hs
  FROM shingles
),
first_seen AS (
  SELECT hs, MIN(doc_id) AS first_doc FROM hashed GROUP BY hs
)
SELECT h.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN f.first_doc = h.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       ROUND(CAST(SUM(CASE WHEN f.first_doc = h.doc_id THEN 1 ELSE 0
                      END) AS DOUBLE) / COUNT(*), 6) AS novelty
FROM hashed h
JOIN first_seen f ON f.hs = h.hs
GROUP BY h.doc_id
ORDER BY h.doc_id
"""


def t19_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit per source — t13's companion on the OTHER axis
    of corpus linguistics: vocabulary growth V(n) = K·n^β against
    tokens read, fit as the OLS slope of ln(cum_vocab) on
    ln(cum_tokens) over the per-source document stream in doc_id
    order. Natural text sits near β ≈ 0.5–0.7; templated or looping
    text saturates early (β → 0), random noise approaches β → 1. The
    curation use: a source whose β collapses mid-crawl started
    repeating itself — the corpus-level signal before any dedup pair
    fires.

    Scale shape: a token's first occurrence is ONE hash agg
    (min doc_id per (source, token) — t18's first-seen shape); per-doc
    new-type counts and token counts join back and a PER-SOURCE window
    (never global) accumulates; the regression is a moment aggregate.
    The fit runs on |docs| rows, not |tokens|."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        "doc_id",
        F.explode(F.expr(tokens_expr("text"))).alias("token"),
    ).filter(F.length("token") > 0)
    first_seen = toks.groupBy("source", "token").agg(
        F.min("doc_id").alias("first_doc")
    )
    new_types = first_seen.groupBy(
        "source", F.col("first_doc").alias("doc_id")
    ).agg(F.count(F.lit(1)).cast("long").alias("new_types"))
    nonempty = f"filter({tokens_expr('text')}, x -> length(x) > 0)"
    per_doc = d.select(
        "source",
        "doc_id",
        F.expr(f"size({nonempty})").cast("long").alias("n_tokens"),
    ).join(new_types, ["source", "doc_id"], "left").select(
        "source",
        "doc_id",
        "n_tokens",
        F.coalesce("new_types", F.lit(0)).alias("new_types"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_doc.select(
        "source",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
        F.sum("new_types").over(w).alias("cum_vocab"),
    )
    y = F.when(
        (F.col("cum_tokens") > 0) & (F.col("cum_vocab") > 0),
        F.log(F.col("cum_vocab").cast("double")),
    )
    x = F.when(
        (F.col("cum_tokens") > 0) & (F.col("cum_vocab") > 0),
        F.log(F.col("cum_tokens").cast("double")),
    )
    return (
        cum.groupBy("source")
        .agg(
            F.round(F.regr_slope(y, x), 4).alias("heaps_beta"),
            F.round(F.regr_r2(y, x), 4).alias("heaps_r2"),
            F.max("cum_vocab").cast("long").alias("total_vocab"),
            F.max("cum_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("source")
    )


T19_SQL = rf"""
WITH toks AS (
  SELECT source, doc_id,
         UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS token
  FROM documents
),
first_seen AS (
  SELECT source, token, MIN(doc_id) AS first_doc
  FROM toks WHERE LENGTH(token) > 0
  GROUP BY source, token
),
new_types AS (
  SELECT source, first_doc AS doc_id,
         CAST(COUNT(*) AS BIGINT) AS new_types
  FROM first_seen GROUP BY source, first_doc
),
per_doc AS (
  SELECT d.source, d.doc_id,
         CAST(CASE WHEN LENGTH(TRIM(d.text)) = 0 THEN 0
              ELSE LEN(list_filter(
                regexp_split_to_array(TRIM(LOWER(d.text)), '\s+'),
                x -> LENGTH(x) > 0))
              END AS BIGINT) AS n_tokens,
         COALESCE(n.new_types, 0) AS new_types
  FROM documents d
  LEFT JOIN new_types n ON n.source = d.source AND n.doc_id = d.doc_id
),
cum AS (
  SELECT source,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens,
         SUM(new_types) OVER (PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_vocab
  FROM per_doc
)
SELECT source,
       ROUND(regr_slope(
         CASE WHEN cum_tokens > 0 AND cum_vocab > 0
              THEN LN(CAST(cum_vocab AS DOUBLE)) END,
         CASE WHEN cum_tokens > 0 AND cum_vocab > 0
              THEN LN(CAST(cum_tokens AS DOUBLE)) END), 4) AS heaps_beta,
       ROUND(regr_r2(
         CASE WHEN cum_tokens > 0 AND cum_vocab > 0
              THEN LN(CAST(cum_vocab AS DOUBLE)) END,
         CASE WHEN cum_tokens > 0 AND cum_vocab > 0
              THEN LN(CAST(cum_tokens AS DOUBLE)) END), 4) AS heaps_r2,
       CAST(MAX(cum_vocab) AS BIGINT) AS total_vocab,
       CAST(MAX(cum_tokens) AS BIGINT) AS total_tokens
FROM cum
GROUP BY source
ORDER BY source
"""


# t20 rule cascade: (name, pass-predicate) in application order. The
# thresholds are tuned to BIND on the synthetic corpus (n_tok spans
# 10-99, mean word length ~4.2-4.8, alpha ratio ~0.81-0.83) so the
# funnel exercises every stage; a production corpus would swap in the
# published Gopher values (50-100k tokens, mwl 3-10, 80% alpha words).
T20_RULES = [
    ("min_tokens", "tg_tok >= 20"),
    ("max_tokens", "tg_tok <= 90"),
    ("mean_word_len",
     "CAST(tg_nonspace AS DOUBLE) / GREATEST(CAST(tg_tok AS DOUBLE), 1.0)"
     " BETWEEN 3.0 AND 4.7"),
    ("alpha_ratio",
     "CAST(tg_alpha AS DOUBLE) / GREATEST(CAST(tg_chars AS DOUBLE), 1.0)"
     " >= 0.815"),
    ("stopword_ratio",
     "CAST(tg_stop AS DOUBLE) / GREATEST(CAST(tg_tok AS DOUBLE), 1.0)"
     " >= 0.02"),
]


def t20_gopher_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule CASCADE with a per-source funnel
    audit: apply T20_RULES in order, and report — per (source, stage)
    — how many documents fail AT that stage (having passed all earlier
    ones) and how many remain. Stage 0 is ingress. This is the
    corpus-cleaning report a pipeline operator reads before committing
    a filter config (Rae et al. 2021, table A1 shape).

    Scale shape: feature extraction and all five rule predicates ride
    the scan projection (pure JVM regex/length expressions); ONE hash
    agg on source (map-side combined to |sources| rows per partition);
    the stack() unpivot runs on the ≤|sources|-row aggregate. Nothing
    but the tiny aggregate crosses the wire — the funnel costs exactly
    one corpus scan at any data size."""
    d = table(spark, sf_dir, "documents")
    feats = d.select(
        "source",
        F.when(F.length(F.trim("text")) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
        .cast("long").alias("tg_tok"),
        F.length(F.regexp_replace("text", r"\s", "")).cast("long")
        .alias("tg_nonspace"),
        F.regexp_count(F.col("text"), F.lit(r"[A-Za-z]")).cast("long")
        .alias("tg_alpha"),
        F.length("text").cast("long").alias("tg_chars"),
        F.regexp_count(F.lower(F.col("text")), F.lit(STOPWORD_RE))
        .cast("long").alias("tg_stop"),
    )
    # prefix conjunction: c_i = passed rules 1..i
    cum = None
    cums = []
    for _, pred in T20_RULES:
        cum = F.expr(pred) if cum is None else (cum & F.expr(pred))
        cums.append(cum)
    agg = feats.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("c0"),
        *[F.sum(c.cast("long")).cast("long").alias(f"c{i + 1}")
          for i, c in enumerate(cums)],
    )
    stack_args = ["CAST(0 AS BIGINT), 'ingress', CAST(0 AS BIGINT), c0"]
    for i, (name, _) in enumerate(T20_RULES, start=1):
        stack_args.append(
            f"CAST({i} AS BIGINT), '{name}', c{i - 1} - c{i}, c{i}"
        )
    n = len(T20_RULES) + 1
    return agg.select(
        "source",
        F.expr(f"stack({n}, {', '.join(stack_args)})"
               " AS (stage, rule, n_failed, n_remaining)"),
    ).orderBy("source", "stage")


def _t20_sql() -> str:
    preds = " , ".join(
        f"CAST(SUM(CASE WHEN {' AND '.join(p for _, p in T20_RULES[:i + 1])}"
        f" THEN 1 ELSE 0 END) AS BIGINT) AS c{i + 1}"
        for i in range(len(T20_RULES))
    )
    stages = [
        "SELECT source, CAST(0 AS BIGINT) AS stage, 'ingress' AS rule, "
        "CAST(0 AS BIGINT) AS n_failed, c0 AS n_remaining FROM agg"
    ]
    for i, (name, _) in enumerate(T20_RULES, start=1):
        stages.append(
            f"SELECT source, CAST({i} AS BIGINT), '{name}', "
            f"c{i - 1} - c{i}, c{i} FROM agg"
        )
    union = "\nUNION ALL\n".join(stages)
    return rf"""
WITH feats AS (
  SELECT source,
         CAST({_N_TOKENS_SQL_FRAG} AS BIGINT) AS tg_tok,
         CAST(LENGTH(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS tg_nonspace,
         CAST(LEN(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS tg_alpha,
         CAST(LENGTH(text) AS BIGINT) AS tg_chars,
         CAST(LEN(regexp_extract_all(LOWER(text), '{STOPWORD_RE}')) AS BIGINT) AS tg_stop
  FROM documents
),
agg AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS c0, {preds}
  FROM feats GROUP BY source
)
SELECT * FROM ({union})
ORDER BY source, stage
"""


KEYWORDS_K = 3  # keywords reported per document


def t21_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction — the top-KEYWORDS_K tokens by
    TF-IDF (in-doc term count × ln(N/df)), the standard first-pass
    summarizer behind corpus exploration, topic labeling, and search
    snippet generation. Rank key is the 1e-6-ROUNDED score (the s09
    discipline: ordering by a raw double invites cross-engine
    last-ulp rank flips; equal (tf, df) pairs tie exactly and break
    on the token).

    Scale shape: explode → ONE (doc, token) hash agg (map-side
    combinable — stopwords collapse per partition before the
    shuffle); df is a COUNT window partitioned by token over THAT
    frame (unique (doc, token) rows, never raw occurrences) — a
    window, not a groupBy+self-join, because the join form references
    the tf_doc subtree twice and Spark executes the explode+agg
    twice (measured: the whole query 2.0× slower, and 3.1×
    super-linear at 10× data from the doubled shuffle volume); the
    corpus-size scalar joins back as a one-row broadcast; the top-k
    window partitions by doc_id — groups are |distinct tokens in one
    doc|, so no global sort and no skew beyond a single document's
    vocabulary (the df window's groups are |docs containing the
    token| ≤ N, bounded by the same hash-partition spread as the
    groupBy it replaces)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.expr(tokens_expr("text"))).alias("token"),
    ).filter(F.length("token") > 0)
    tf_doc = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf_doc")
    )
    total = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    wdf = Window.partitionBy("token")
    scored = (
        tf_doc.withColumn(
            "df", F.count(F.lit(1)).over(wdf).cast("long")
        )
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "token",
            "tf_doc",
            "df",
            F.round(
                F.col("tf_doc")
                * F.log(F.col("n_docs") / F.col("df")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= KEYWORDS_K)
        .select("doc_id", "rk", "token", "tf_doc", "df", "score")
        .orderBy("doc_id", "rk")
    )


T21_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS token
  FROM documents
),
tf_doc AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf_doc
  FROM toks WHERE LENGTH(token) > 0
  GROUP BY doc_id, token
),
df_tok AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df
  FROM tf_doc GROUP BY token
),
total AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents
),
scored AS (
  SELECT t.doc_id, t.token, t.tf_doc, d.df,
         ROUND(t.tf_doc * LN(n_docs / d.df), 6) AS score
  FROM tf_doc t
  JOIN df_tok d ON d.token = t.token, total
),
ranked AS (
  SELECT *,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score DESC, token ASC) AS BIGINT) AS rk
  FROM scored
)
SELECT doc_id, rk, token, tf_doc, df, score
FROM ranked WHERE rk <= {KEYWORDS_K}
ORDER BY doc_id, rk
"""


def t22_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-quality audit of the t03 language ID against the
    corpus's declared ``lang`` labels: per language class (union of
    labeled and predicted, including t03's 'unk' fallback), the
    labeled/predicted/correct counts and precision / recall / F1 —
    the go/no-go read before trusting a heuristic classifier to route
    a 100 TB corpus (s18 is the same audit shape for the embedding
    kNN labeler). A NULL declared label is a real class ('<null>',
    coalesced identically on both engines); t03's prediction is never
    null by construction.

    Scale shape: three hash aggs over t03's row-local projection
    (each map-side combines to |langs| rows per partition) joined on
    the ≤ |langs|-row aggregate frame — the corpus is scanned once
    per agg and never pairs with itself; metrics are row-local
    arithmetic on the tiny joined frame. F1 is computed from the
    UNROUNDED precision/recall on both engines, then rounded."""
    pairs = t03_langid(spark, sf_dir).select(
        F.coalesce("labeled_lang", F.lit("<null>")).alias("lab"),
        F.col("pred_lang").alias("prd"),
    )
    lab = pairs.groupBy(F.col("lab").alias("lang")).agg(
        F.count(F.lit(1)).cast("long").alias("n_labeled")
    )
    prd = pairs.groupBy(F.col("prd").alias("lang")).agg(
        F.count(F.lit(1)).cast("long").alias("n_predicted")
    )
    cor = (
        pairs.filter(F.col("lab") == F.col("prd"))
        .groupBy(F.col("lab").alias("lang"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_correct"))
    )
    j = (
        lab.join(prd, "lang", "full")
        .join(cor, "lang", "left")
        .select(
            "lang",
            F.coalesce("n_labeled", F.lit(0)).cast("long")
            .alias("n_labeled"),
            F.coalesce("n_predicted", F.lit(0)).cast("long")
            .alias("n_predicted"),
            F.coalesce("n_correct", F.lit(0)).cast("long")
            .alias("n_correct"),
        )
    )
    p = F.when(
        F.col("n_predicted") > 0,
        F.col("n_correct") / F.col("n_predicted").cast("double"),
    ).otherwise(F.lit(0.0))
    r = F.when(
        F.col("n_labeled") > 0,
        F.col("n_correct") / F.col("n_labeled").cast("double"),
    ).otherwise(F.lit(0.0))
    f1 = F.when(p + r > 0, 2.0 * p * r / (p + r)).otherwise(F.lit(0.0))
    return j.select(
        "lang",
        "n_labeled",
        "n_predicted",
        "n_correct",
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    ).orderBy("lang")


def _t22_sql() -> str:
    return f"""
WITH t03 AS ({_t03_sql()}),
pairs AS (
  SELECT COALESCE(labeled_lang, '<null>') AS lab, pred_lang AS prd
  FROM t03
),
lab AS (
  SELECT lab AS lang, CAST(COUNT(*) AS BIGINT) AS n_labeled
  FROM pairs GROUP BY 1
),
prd AS (
  SELECT prd AS lang, CAST(COUNT(*) AS BIGINT) AS n_predicted
  FROM pairs GROUP BY 1
),
cor AS (
  SELECT lab AS lang, CAST(COUNT(*) AS BIGINT) AS n_correct
  FROM pairs WHERE lab = prd GROUP BY 1
),
j AS (
  SELECT lang,
         CAST(COALESCE(l.n_labeled, 0) AS BIGINT) AS n_labeled,
         CAST(COALESCE(p.n_predicted, 0) AS BIGINT) AS n_predicted,
         CAST(COALESCE(c.n_correct, 0) AS BIGINT) AS n_correct
  FROM lab l
  FULL OUTER JOIN prd p USING (lang)
  LEFT JOIN cor c USING (lang)
),
m AS (
  SELECT *,
         CASE WHEN n_predicted > 0
              THEN n_correct / CAST(n_predicted AS DOUBLE)
              ELSE 0.0 END AS p_,
         CASE WHEN n_labeled > 0
              THEN n_correct / CAST(n_labeled AS DOUBLE)
              ELSE 0.0 END AS r_
  FROM j
)
SELECT lang, n_labeled, n_predicted, n_correct,
       ROUND(p_, 6) AS precision,
       ROUND(r_, 6) AS recall,
       ROUND(CASE WHEN p_ + r_ > 0
                  THEN 2.0 * p_ * r_ / (p_ + r_)
                  ELSE 0.0 END, 6) AS f1
FROM m
ORDER BY lang
"""


# --- t23: PMI collocations ----------------------------------------------

PMI_WINDOW = 3  # co-occurrence: 1 <= pos(w2) - pos(w1) <= 3
PMI_MIN_PAIR = 3  # noise floor: pairs seen fewer times are not scored
PMI_TOP_K = 30


def t23_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: the corpus's top word pairs by
    pointwise mutual information over a forward co-occurrence window —
    PMI(x,y) = ln( p(x,y) / (p(x)·p(y)) ) with pair probability
    c_xy/P and unigram probabilities c/N. High-PMI pairs are
    multi-word expressions ("new york", "machine learning") — the
    association statistic t14's conditional ln p(w2|w1) is not (t14
    rewards frequent CONTINUATIONS; PMI rewards pairs that co-occur
    far above chance regardless of marginal frequency).

    Scale shape: co-occurring pairs are generated INSIDE the scan
    projection (a nested sequence/transform over the token array, one
    explode of ≤ W·|tokens| rows) — never a positional self-join of
    the token stream, which would shuffle every token twice and pay
    |doc|·W join rows through an exchange. Downstream is two
    vocab-sized hash aggs, two vocab-sized equi-joins, a one-row
    broadcast of the (N, P) totals, and a TakeOrderedAndProject
    top-k. ln() is the only FP seam — absorbed by rounding to 1e-6
    before the rank (the s09 discipline).
    """
    d = table(spark, sf_dir, "documents")
    toks = f"filter({tokens_expr('text')}, x -> length(x) > 0)"
    pair_list = (
        "CASE WHEN size(tk) >= 2 THEN flatten(transform("
        "  sequence(1, size(tk) - 1), i -> transform("
        f"    sequence(i + 1, least(i + {PMI_WINDOW}, size(tk))),"
        "    j -> struct(element_at(tk, i) AS w1,"
        "                element_at(tk, j) AS w2))))"
        " ELSE array() END"
    )
    tk = d.select(F.expr(toks).alias("tk"))
    pairs = tk.select(F.explode(F.expr(pair_list)).alias("p")).select(
        "p.w1", "p.w2"
    )
    uni = (
        tk.select(F.explode("tk").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    cp = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_pair")
    )
    totals = uni.agg(
        F.sum("c").alias("n_tokens")
    ).crossJoin(
        F.broadcast(cp.agg(F.sum("n_pair").cast("double").alias("n_pairs")))
    )
    pmi = (
        F.log(F.col("n_pair").cast("double"))
        + F.lit(2.0) * F.log("n_tokens")
        - F.log("n_pairs")
        - F.log(F.col("c1"))
        - F.log(F.col("c2"))
    )
    return (
        cp.filter(F.col("n_pair") >= PMI_MIN_PAIR)
        .join(
            uni.select(F.col("token").alias("w1"), F.col("c").alias("c1")),
            "w1",
        )
        .join(
            uni.select(F.col("token").alias("w2"), F.col("c").alias("c2")),
            "w2",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "w1", "w2", "n_pair", F.round(pmi, 6).alias("pmi")
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(PMI_TOP_K)
    )


def _t23_sql() -> str:
    return rf"""
WITH toks AS (
  SELECT list_filter(
           regexp_split_to_array(TRIM(LOWER(text)), '\s+'),
           x -> LENGTH(x) > 0) AS tk
  FROM documents
),
pos AS (
  SELECT tk, UNNEST(RANGE(1, GREATEST(LEN(tk), 1))) AS i
  FROM toks WHERE LEN(tk) >= 2
),
pairs AS (
  SELECT tk[CAST(i AS INTEGER)] AS w1, tk[CAST(j AS INTEGER)] AS w2
  FROM (SELECT tk, i,
               UNNEST(RANGE(i + 1, LEAST(i + {PMI_WINDOW}, LEN(tk)) + 1))
                 AS j
        FROM pos)
),
uni AS (
  SELECT UNNEST(tk) AS token FROM toks
),
ucnt AS (
  SELECT token, CAST(COUNT(*) AS DOUBLE) AS c FROM uni GROUP BY token
),
pcnt AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM pairs GROUP BY w1, w2
),
totals AS (
  SELECT (SELECT SUM(c) FROM ucnt) AS n_tokens,
         (SELECT CAST(SUM(n_pair) AS DOUBLE) FROM pcnt) AS n_pairs
)
SELECT p.w1, p.w2, p.n_pair,
       ROUND(LN(CAST(p.n_pair AS DOUBLE)) + 2.0 * LN(t.n_tokens)
             - LN(t.n_pairs) - LN(a.c) - LN(b.c), 6) AS pmi
FROM pcnt p
JOIN ucnt a ON a.token = p.w1
JOIN ucnt b ON b.token = p.w2
CROSS JOIN totals t
WHERE p.n_pair >= {PMI_MIN_PAIR}
ORDER BY pmi DESC, p.w1, p.w2
LIMIT {PMI_TOP_K}
"""


QUERIES = [
    Query("t01_token_count", t01_token_count, T01_SQL,
          "whitespace + subword-proxy token counts"),
    Query("t02_quality_score", t02_quality_score, T02_SQL,
          "heuristic quality scoring (C4/Gopher-style)"),
    Query("t03_langid", t03_langid, _t03_sql(),
          "marker-word language ID"),
    Query("t04_fingerprint", t04_fingerprint, T04_SQL,
          "exact + normalized MD5 fingerprints"),
    Query("t05_rolling_hash", t05_rolling_hash, T05_SQL,
          "Rabin-Karp rolling hash prefix fingerprint"),
    Query("t06_repetition", t06_repetition, T06_SQL,
          "duplicate word-2-gram fraction (Gopher repetition rule)"),
    Query("t07_vocab_idf", t07_vocab_idf, T07_SQL,
          "corpus vocabulary: term/doc frequencies + IDF, top-k"),
    Query("t08_unigram_logprob", t08_unigram_logprob, T08_SQL,
          "perplexity-proxy scoring with a corpus-trained unigram LM"),
    Query("t09_pii_scrub", t09_pii_scrub, T09_SQL,
          "PII redaction (email/phone/IPv4) with removal counts"),
    Query("t10_char_entropy", t10_char_entropy, T10_SQL,
          "character-trigram Shannon entropy (gibberish detector)"),
    Query("t11_readability", t11_readability, T11_SQL,
          "Flesch reading-ease (vowel-group syllable proxy)"),
    Query("t12_lexical_diversity", t12_lexical_diversity, T12_SQL,
          "type-token ratio, hapax fraction, mean word length"),
    Query("t13_zipf_fit", t13_zipf_fit, T13_SQL,
          "Zipf-law fit per source (OLS of ln freq vs ln rank over "
          "top terms)"),
    Query("t14_bigram_logprob", t14_bigram_logprob, T14_SQL,
          "corpus-trained bigram LM perplexity proxy (conditional "
          "ln p(w2|w1), vocab-side join)"),
    Query("t15_perplexity_buckets", t15_perplexity_buckets, T15_SQL,
          "CCNet-style head/middle/tail perplexity triage via "
          "broadcast percentile cuts (no global ntile)"),
    Query("t16_bm25_topk", t16_bm25_topk, _t16_sql(),
          "BM25 keyword retrieval: Lucene-idf scoring of the matching "
          "docs only (inverted-list probe), top-10"),
    Query("t17_chunk_passages", t17_chunk_passages, T17_SQL,
          "sliding-window passage chunking (size/stride, short tail "
          "absorbed) with per-chunk fingerprints"),
    Query("t18_ngram_novelty", t18_ngram_novelty, _t18_sql(),
          "per-doc n-gram novelty: fraction of shingles first "
          "introduced by the doc (corpus-order first-occurrence)"),
    Query("t19_heaps_fit", t19_heaps_fit, T19_SQL,
          "Heaps'-law vocabulary-growth fit per source: OLS of "
          "ln(cum vocab) on ln(cum tokens) over the doc stream"),
    Query("t20_gopher_funnel", t20_gopher_funnel, _t20_sql(),
          "Gopher-rule cascade funnel: per (source, stage) "
          "fail-here/remaining counts in one corpus scan + one agg"),
    Query("t21_tfidf_keywords", t21_tfidf_keywords, T21_SQL,
          "per-doc keyword extraction: top-3 tokens by 1e-6-rounded "
          "TF-IDF, per-doc window over the (doc, token) agg"),
    Query("t22_langid_eval", t22_langid_eval, _t22_sql(),
          "lang-ID quality audit: per-class precision/recall/F1 of "
          "t03 predictions vs declared labels (s18's audit shape "
          "for text)"),
    Query("t23_pmi_collocations", t23_pmi_collocations, _t23_sql(),
          "collocation extraction: top word pairs by PMI over a "
          "forward co-occurrence window, pairs generated inside the "
          "scan projection (no positional self-join)"),
]
