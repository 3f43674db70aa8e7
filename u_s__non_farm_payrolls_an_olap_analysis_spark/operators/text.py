"""Text-analysis operators for LLM data pipelines (SURVEY §2.10 X13 +
BASELINE.json north-star: language-ID, quality scoring, token counting,
fingerprinting) over the ``documents`` table.

Everything is builtin string/array expressions — explode/groupBy for term
stats, ``regexp_count`` for regex tokenization, ``md5`` for fingerprints.
No Python UDFs: at 100 TB these run entirely inside whole-stage codegen,
and the explode→groupBy term-frequency shape is the canonical
map-side-combine aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table

# Stopword set for quality/langid heuristics: function words present in the
# fixture vocabulary. At production scale this would be a per-language list;
# the operator shape (token-set membership ratio) is identical.
STOPWORDS = ("the", "a")
_STOP_SQL = "('the', 'a')"


def _tokens(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def text_tokenize_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — corpus term statistics: total term frequency and document
    frequency per token. explode → two-level aggregate; the groupBy keys
    are low-cardinality so map-side partial aggregation collapses almost
    everything before the shuffle."""
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens()).alias("token"))
    return tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals (length, lexical diversity, stopword
    ratio, mean token length) and a composite score — the standard cheap
    pre-filter before expensive LLM-pipeline stages. All integer-derived
    arithmetic → bitwise-deterministic across engines."""
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens()).alias("token"))
    stats = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("n_distinct"),
        F.sum(F.col("token").isin(*STOPWORDS).cast("long")).alias("n_stop"),
        F.sum(F.length("token")).alias("sum_len"),
    )
    diversity = F.col("n_distinct") / F.col("n_tokens")
    stop_ratio = F.col("n_stop") / F.col("n_tokens")
    length_score = F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
    return stats.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(F.col("sum_len") / F.col("n_tokens"), 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(
            0.5 * diversity + 0.3 * (1.0 - stop_ratio) + 0.2 * length_score, 6
        ).alias("quality"),
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: non-ASCII content → 'other'; else an English
    function-word ratio threshold → 'en' / 'unknown'. (An n-gram profile
    model is the production version; the fixture corpus is ASCII word soup,
    so the heuristic layer is what's exercised — the operator shape, a
    CASE over cheap text statistics, is the same.)"""
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang", F.explode(_tokens()).alias("token"))
    stats = tok.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("token").isin(*STOPWORDS).cast("long")).alias("n_stop"),
    )
    docs_flag = docs.select(
        "doc_id", F.col("text").rlike(r"[^\x00-\x7F]").alias("non_ascii")
    )
    stop_ratio = F.col("n_stop") / F.col("n_tokens")
    pred = (
        F.when(F.col("non_ascii"), F.lit("other"))
        .when(stop_ratio >= 0.03, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )
    return (
        stats.join(docs_flag, "doc_id")
        .select(
            "doc_id",
            "lang",
            F.round(stop_ratio, 6).alias("stop_ratio"),
            pred.alias("pred_lang"),
        )
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over normalized text (lowercase,
    trimmed, whitespace-collapsed) + a 64-bit prefix for compact
    dedup-key joins. Identical hex in Spark and DuckDB → oracle-checkable,
    unlike engine-specific hash functions (xxhash64 vs DuckDB hash)."""
    docs = read_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    fp = F.md5(norm)
    return docs.select(
        "doc_id",
        fp.alias("fp"),
        F.substring(fp, 1, 16).alias("fp64"),
        F.length(norm).alias("norm_len"),
    )


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a regex tokenizer
    (word-char runs — the BPE-pretokenizer shape). ``regexp_count`` is a
    codegen'd JVM expression; counts feed chunking/cost estimates."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_tokens()).alias("n_ws_tokens"),
        F.regexp_count(F.col("text"), F.lit("[a-z0-9]+")).alias("n_re_tokens"),
        F.length("text").alias("n_chars_computed"),
        "n_chars",
    )


def text_clean_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cleaning filter as a single-pass funnel: per source, how
    many documents survive the composed keep-predicate (length window,
    token-count window, bounded mean token length, contains a function
    word). One conditional aggregate — the filter itself is pure codegen'd
    string math, so at 100 TB this is one scan, no shuffle beyond the
    per-source partials."""
    docs = read_table(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens())
    # mean token length from chars minus separators — integer-derived,
    # bitwise-portable
    avg_tok = (F.length("text") - (n_tokens - 1)) / n_tokens
    keep = (
        F.length("text").between(20, 2000)
        & n_tokens.between(5, 500)
        & (avg_tok <= 10.0)
        & F.array_contains(F.split(F.lower(F.col("text")), " "), "the")
    )
    # NULL text makes `keep` NULL, and SUM over an all-NULL group is NULL
    # while the oracle's CASE ... ELSE 0 yields 0 — coalesce to FALSE so a
    # source whose documents all have NULL text counts 0 kept, not NULL.
    kept = F.coalesce(keep, F.lit(False)).cast("long")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept).alias("n_kept"),
            F.round(F.sum(kept) / F.count(F.lit(1)), 6).alias("keep_rate"),
        )
        .orderBy("source")
    )


def text_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — fuzzy (edit-distance) near-match pairs: block on the
    20-char text prefix (near-dups share it unless the edit falls in the
    first 20 chars — the standard prefix-blocking tradeoff), then verify
    candidates with ``levenshtein`` over the 80-char head. The candidate
    stage is an equi-join on the block key — never all-pairs — and both
    engines implement the same Wagner-Fischer distance."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, 20).alias("blk"),
        F.substring("text", 1, 80).alias("head"),
    )
    a, b = docs.alias("a"), docs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.head"), F.col("b.head")).alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 16)
    )


QUERIES = {
    "text_clean_funnel": text_clean_funnel,
    "text_tokenize_tf": text_tokenize_tf,
    "text_quality_score": text_quality_score,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
    "text_token_count": text_token_count,
    "text_fuzzy_match": text_fuzzy_match,
}

_TOK_SQL = (
    "SELECT doc_id, lang, t.tok AS token FROM "
    "(SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents), "
    "UNNEST(toks) AS t(tok)"
)

ORACLE = {
    "text_fuzzy_match": (
        "WITH d AS (SELECT doc_id, substring(text, 1, 20) AS blk, "
        "substring(text, 1, 80) AS head FROM documents) "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "CAST(levenshtein(a.head, b.head) AS INT) AS edit_dist "
        "FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id "
        "WHERE levenshtein(a.head, b.head) <= 16"
    ),
    "text_clean_funnel": (
        "WITH d AS (SELECT source, length(text) AS n_chars, "
        "len(string_split(text, ' ')) AS n_tokens, "
        "list_contains(string_split(lower(text), ' '), 'the') AS has_the "
        "FROM documents), "
        "k AS (SELECT source, CASE WHEN n_chars BETWEEN 20 AND 2000 "
        "AND n_tokens BETWEEN 5 AND 500 "
        "AND (CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens) <= 10.0 "
        "AND has_the THEN 1 ELSE 0 END AS keep FROM d) "
        "SELECT source, COUNT(*) AS n_docs, "
        "CAST(SUM(keep) AS BIGINT) AS n_kept, "
        "ROUND(CAST(SUM(keep) AS DOUBLE) / COUNT(*), 6) AS keep_rate "
        "FROM k GROUP BY 1 ORDER BY 1"
    ),
    "text_tokenize_tf": (
        f"WITH t AS ({_TOK_SQL}) "
        "SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df "
        "FROM t GROUP BY 1"
    ),
    "text_quality_score": (
        f"WITH t AS ({_TOK_SQL}), s AS ("
        "SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT token) AS n_distinct, "
        f"CAST(SUM(CASE WHEN token IN {_STOP_SQL} THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_stop, "
        "CAST(SUM(length(token)) AS BIGINT) AS sum_len FROM t GROUP BY 1) "
        "SELECT doc_id, n_tokens, n_distinct, "
        "ROUND(sum_len / n_tokens, 6) AS avg_token_len, "
        "ROUND(n_stop / n_tokens, 6) AS stop_ratio, "
        "ROUND(0.5 * (n_distinct / n_tokens) + 0.3 * (1.0 - n_stop / n_tokens) "
        "+ 0.2 * LEAST(n_tokens / 100.0, 1.0), 6) AS quality FROM s"
    ),
    "text_langid": (
        f"WITH t AS ({_TOK_SQL}), s AS ("
        "SELECT doc_id, lang, COUNT(*) AS n_tokens, "
        f"CAST(SUM(CASE WHEN token IN {_STOP_SQL} THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_stop FROM t GROUP BY 1, 2), "
        "f AS (SELECT doc_id, regexp_matches(text, '[^[:ascii:]]') AS non_ascii "
        "FROM documents) "
        "SELECT s.doc_id, s.lang, ROUND(n_stop / n_tokens, 6) AS stop_ratio, "
        "CASE WHEN f.non_ascii THEN 'other' "
        "WHEN n_stop / n_tokens >= 0.03 THEN 'en' ELSE 'unknown' END AS pred_lang "
        "FROM s JOIN f ON s.doc_id = f.doc_id"
    ),
    "text_fingerprint": (
        "SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) "
        "AS fp, "
        "substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 16) "
        "AS fp64, "
        "CAST(length(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS INT) "
        "AS norm_len FROM documents"
    ),
    "text_token_count": (
        "SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens, "
        "CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS n_re_tokens, "
        "CAST(length(text) AS INT) AS n_chars_computed, n_chars FROM documents"
    ),
}
