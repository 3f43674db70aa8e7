"""Adversarial-input parity tests: the inputs that exposed latent
operator/oracle divergences (commit history: malformed JSON, non-object
JSON, wrong-typed values, non-ASCII text, zero/constant prices). Each case
runs BOTH the Spark operator and its DuckDB oracle on the same hostile data
and asserts exact agreement — the clean driver fixtures can't cover these.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

import __spark_entry__ as entrymod
from u_s__non_farm_payrolls_an_olap_analysis_spark.operators import (
    aggregates,
    custom_udf,
    json_ops,
    multimodal,
)


@pytest.fixture(scope="module")
def hostile_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("hostile")
    orders = [
        (1, 1, "F", 500.0, dt.datetime(1999, 1, 1), "x"),
        (2, 1, "F", 500.0, dt.datetime(1999, 2, 1), "x"),  # constant-span year
        (3, 1, "F", 0.0, dt.datetime(2000, 1, 1), "x"),    # zero price
        # layout hostiles: a pre-1996 year (one-sided schema evolution),
        # and a 1997 with NO high-value rows (dynamic-overwrite no-op)
        (4, 1, "F", 400.0, dt.datetime(1995, 6, 1), "x"),
        (5, 1, "F", 400.0, dt.datetime(1997, 3, 1), "x"),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    events = [
        (0, dt.datetime(2024, 1, 1), 1, "view", 1.0, '{"k": 5}'),
        (1, dt.datetime(2024, 1, 1), 1, "view", 1.0, "not json"),
        (2, dt.datetime(2024, 1, 1), 1, "view", 1.0, "[1]"),
        (3, dt.datetime(2024, 1, 1), 1, "view", 1.0, '{"k": "abc"}'),
        (4, dt.datetime(2024, 1, 1), 1, "click", 1.0, '{"k": 7, "x": 2}'),
    ]
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    docs = [
        (0, "émodé non ascii", "fr", "s0", 15),
        (1, "ascii text", "en", "s0", 10),
        # llm_prep hostiles: empty text, single token, sub-n-gram lengths,
        # heavy repetition, and NATURAL PII alongside the injected spans
        (2, "", "en", "s1", 0),
        (3, "one", "en", "s1", 3),
        (4, "spam spam spam spam spam spam", "en", "s1", 29),
        (5, "reach bob123@mail.com or 555-1234 at 10.0.0.1 now ok", "en",
         "s1", 52),
        # try-cast grammar hostiles: the prefixes where the engines'
        # native try-cast string grammars DIVERGE (decimal, exponent,
        # hex) plus the shared-domain forms (digits, sign, overflow)
        (6, "12.5 likes this", "en", "s2", 15),
        (7, "1e+4 items counted", "en", "s2", 18),
        (8, "1234 numeric start", "en", "s2", 18),
        (9, "0x1f hex prefix", "en", "s2", 15),
        (10, "+42 signed", "en", "s2", 10),
        (11, "99999999999 overflowing int32", "en", "s2", 29),
        # trailing-newline token: Java-regex '$' matches BEFORE a final
        # newline, RE2 '$' does not — the \A..\z anchors must reject
        # '123\n' in BOTH engines (round-10 ADVICE)
        (12, "123\n trailing newline token", "en", "s2", 26),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def duck(hostile_dir):
    con = duckdb.connect()
    for t in ("orders", "events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{hostile_dir}/{t}.parquet/*.parquet'"
        )
    return con


def _assert_parity(spark_df, con, name):
    s = sorted(map(tuple, spark_df.collect()))
    o = sorted(map(tuple, con.execute(entrymod.oracle_sql()[name]).fetchall()))
    assert s == o, f"{name}: spark={s} oracle={o}"


@pytest.mark.parametrize(
    "name",
    ["json_from_json_struct", "json_map_explode", "json_extract_props"],
)
def test_hostile_json_parity(spark, hostile_dir, duck, name):
    _assert_parity(json_ops.QUERIES[name](spark, hostile_dir), duck, name)


def test_hostile_geomean_parity(spark, hostile_dir, duck):
    _assert_parity(
        aggregates.agg_custom_udaf_geomean(spark, hostile_dir),
        duck,
        "agg_custom_udaf_geomean",
    )


def test_hostile_multimodal_parity(spark, hostile_dir, duck):
    _assert_parity(
        multimodal.multimodal_decode_meta(spark, hostile_dir),
        duck,
        "multimodal_decode_meta",
    )


def test_constant_span_normalize_no_crash(spark, hostile_dir):
    out = {
        r["o_orderkey"]: r["norm_price"]
        for r in custom_udf.grouped_map_normalize(spark, hostile_dir).collect()
    }
    assert out[1] == 0.0 and out[2] == 0.0  # constant-span year
    assert out[3] == 0.0  # single-order year


def test_frame_sample_handles_zero_row_arrow_batch():
    """A zero-row Arrow batch must not crash the vectorized explode: with
    empty input, starts = concatenate(([0], cumsum(kept)[:-1])) has length
    1 while kept has length 0, so np.repeat would raise (round-7 ADVICE).
    Spark rarely emits empty batches, but a latent crash is still a crash."""
    import pandas as pd

    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.multimodal import (
        _frame_sample_batches,
    )

    empty = pd.DataFrame({"doc_id": [], "kind": [], "media": []})
    nonempty = pd.DataFrame(
        {"doc_id": [1], "kind": ["image"], "media": [b"x" * 500]}
    )
    out = list(_frame_sample_batches(iter([empty, nonempty, empty])))
    assert sum(len(p) for p in out) > 0
    assert all(set(p.columns) == {
        "doc_id", "kind", "frame_idx", "frame_off", "remaining_bytes"
    } for p in out)


@pytest.mark.parametrize(
    "name",
    [
        "pii_detect_stats",
        "pii_redact",
        "decontam_overlap",
        "quality_repetition_signals",
        "chunk_documents",
        "vocab_coverage",
        # round-8 late: packing treats the empty doc as its 1-token split
        # artifact identically in both engines; mixture thresholds stay
        # integer-exact on tiny per-language counts
        "pack_training_sequences",
        "sample_corpus_mixture",
        # unigram LM over hostile docs: ''-tokens from empty docs are
        # legitimate vocabulary entries and ln stays finite (cnt >= 1)
        "quality_unigram_surprisal",
        # round-8 final: the md5 shuffle key is defined for every doc_id
        # (no text dependence); BPE pairs must agree on the empty doc,
        # the 1-char-word filter, and non-ASCII words (regex class
        # [a-z] excludes é identically in Java regex and RE2)
        "corpus_shuffle_shards",
        "vocab_bpe_pair_counts",
        # round-10: Gopher rule gates over the hostile docs — empty text
        # (n=0 → NULL ratios, all-false rules), 1-token, repetition and
        # symbol-bearing rows must gate identically in both engines
        "quality_gopher_rules",
        # round-10: linear hashed-feature classifier — the empty doc's
        # ''-token hashes to a deterministic bucket (n_tokens=1, never
        # 0, so the score division is always defined) and scaled-int64
        # contributions must agree on non-ASCII tokens
        "quality_linear_classifier",
    ],
)
def test_hostile_llm_prep_parity(spark, hostile_dir, duck, name):
    """Empty/1-token/sub-n-gram docs, pure repetition, and natural PII
    spans must produce IDENTICAL results from the operator and its
    oracle — the regex/dialect and n-gram-guard edge cases the clean
    fixture never exercises."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators import (
        llm_prep,
    )

    _assert_parity(llm_prep.QUERIES[name](spark, hostile_dir), duck, name)


@pytest.mark.parametrize(
    "name",
    [
        # funnel: click/purchase at the EXACT same timestamp as the view
        # (ties satisfy >= identically in both engines); winsorize: tiny
        # single-value groups (k=0, thresholds = the value itself);
        # retention: one user, one day (offset-0 cell only)
        "agg_funnel_conversion",
        "norm_winsorize_clip",
        "retention_cohorts",
        # single-month priority segments: slope/intercept guard to NULL
        # (0/0 would be NaN, which compares unequal across engines)
        "agg_linear_trend",
        # Markov transitions: ALL hostile events share one timestamp, so
        # the (ts, event_id) tiebreak decides EVERY lag pair — any
        # ordering divergence between the engines' window sorts would
        # permute the transition counts
        "events_markov_transitions",
    ],
)
def test_hostile_events_analytics_parity(spark, hostile_dir, duck, name):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators import (
        analytics,
    )

    _assert_parity(analytics.QUERIES[name](spark, hostile_dir), duck, name)


@pytest.mark.parametrize(
    "name",
    [
        # try-cast on the grammar-divergence prefixes (guarded shared
        # domain); schema evolution with a one-sided (tiny v1) split and
        # an all-unflagged 1996+ year (0-vs-NULL sum); dynamic overwrite
        # where NO 1997 row qualifies (write is a no-op, old partition
        # must survive in BOTH engines' view)
        "scalar_try_functions",
        "scan_schema_evolution",
        "layout_partition_overwrite_dynamic",
        # planted-SimHash harness over the hostile docs (empty text,
        # 1-token, repetition, PII rows): exact copies must surface at
        # Hamming 0 for every planted doc_id regardless of content
        "dedup_simhash_planted",
        # planted-MinHash harness (round 10): exact copies must verify at
        # Jaccard exactly 1.0 for every planted doc that has >=1 shingle
        # (sub-3-token and empty texts drop out in BOTH engines)
        "dedup_minhash_planted",
    ],
)
def test_hostile_layout_scalar_parity(spark, hostile_dir, duck, name):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators import (
        dedup,
        layout,
        scalars,
    )

    q = {**scalars.QUERIES, **layout.QUERIES, **dedup.QUERIES}[name]
    _assert_parity(q(spark, hostile_dir), duck, name)


@pytest.mark.parametrize(
    "name", ["stream_left_outer_join", "stream_full_outer_join"]
)
def test_hostile_stream_outer_join_parity(spark, hostile_dir, duck, name):
    """The hostile events fixture has NO purchases at all: the left-outer
    output must be empty (no left rows exist) and the full-outer must
    null-extend EVERY click — the all-one-side edge the clean fixture
    never hits, run through the real streaming drain + horizon
    sentinels against the batch oracle."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.streaming import (
        stream_windows,
    )

    _assert_parity(
        stream_windows.QUERIES[name](spark, hostile_dir), duck, name
    )


@pytest.mark.parametrize(
    "name",
    [
        # BM25: no hostile doc contains a query term -> both engines must
        # agree on the EMPTY candidate set (1-row NULL df aggregates never
        # reach the output); empty text contributes dl=1 ('' token) to
        # avgdl identically (split('', ' ') = [''] in both engines)
        "text_bm25_topk",
        # CCNet terciles over 13 docs incl. ''-token vocabulary entries;
        # NTILE(3) semantics must agree on a non-divisible count
        "quality_ccnet_buckets",
        # rank-profile langid: sub-trigram docs ('', 'one') produce no doc
        # profile and must be DROPPED by both engines, not scored; the
        # sequence()/range() trigram guards fire on them
        "text_langid_ngram_profile",
        # word-graph PageRank: sub-bigram docs contribute no edges; the
        # '123\n' token is a node whose md5/equality must agree
        "graph_pagerank_tokens",
        # temperature mixing over 3 tiny sources; pow/floor determinism
        "sample_temperature_mixture",
        # ExactSubstr spans: all but one hostile doc are shorter than
        # SUBSTR_N tokens (the sequence()/range() gram guards fire on
        # them); the single exactly-8-token doc must emit one
        # zero-duplicated gram row in BOTH engines
        "dedup_exact_substring_spans",
        # DSIR: the lone non-'en' doc carries the non-ASCII tokens, so
        # target/raw bucket hashing must agree on them; ''-token and
        # sub-bigram docs contribute unigram-only feature streams;
        # NTILE(4) on a tiny non-divisible doc count
        "sample_dsir_importance",
        # containment: the repetition doc collapses to ONE distinct
        # shingle under array_distinct/DISTINCT in both engines; no
        # hostile doc shares a shingle, so both must emit empty
        "dedup_containment_ngram",
        # sliding windows: the empty doc gets exactly ONE window holding
        # the '' token (n=1 <= W), 1-token and sub-window docs likewise;
        # both engines' slice-beyond-end semantics must agree
        "chunk_sliding_window",
        # winnowing: sub-K-token docs (incl. empty text) drop in both
        # engines; the repetition doc's all-identical gram hashes force
        # the rightmost-tie rule to decide EVERY window — any tie-break
        # divergence between the engines' min(key) would surface here
        "text_winnow_fingerprint",
        # prefix-filtered ssjoin: no hostile doc shares a shingle, so
        # prefixes are disjoint and both engines must emit empty; the
        # repetition doc's single-distinct-shingle set gets prefix
        # length 1 - ceil(0.8) + 1 = 1 (integer-ceil path) in both
        "dedup_allpairs_prefix",
        # association rules: n_docs counts NULL-text docs while baskets
        # exclude them — the integer minsup ceiling must agree; the ''
        # token is a basket item whose equality/ordering must match
        "mine_association_rules",
        # zipf fit: tiny vocabulary incl. the '' token; ln(rank)/ln(freq)
        # scaled-int regression terms must agree on a 13-doc corpus
        "corpus_zipf_fit",
        # BPE apply: the ''-word encodes to 0 units (regexp_replace('')
        # stays empty, both engines' split-on-|| drops empties); digits
        # and non-ASCII words pass through unmerged; the repetition doc
        # stresses the broadcast vocab join on one giant count
        "text_bpe_encode_count",
        # quantile cut: percentile/quantile_cont interpolation on 13
        # rounded scores (h = 12*0.25 = 3 exactly — no interpolation —
        # but engines must also agree on <= ties at the threshold)
        "sample_quantile_threshold_cut",
        # stupid backoff: odd-doc tokens unseen in the even-half LM
        # exercise the OOV floor (COALESCE to count 1) and the unigram
        # backoff in BOTH engines; sub-bigram docs drop identically
        "quality_stupid_backoff_logprob",
        # RAKE: empty text marks the '' token as a delimiter (no phrase)
        # in both engines; the repetition doc is one 6-word phrase of a
        # single word (degree 36 / freq 6); '123\n' is an ordinary
        # keyword whose string equality must agree
        "text_keyword_extract_rake",
        # LPA: sub-bigram docs contribute no edges; self-loop bigrams
        # (spam spam) are dropped by BOTH engines' src<>dst filter; the
        # vote tie-break (cnt desc, label asc) decides nearly every node
        # on this tiny graph
        "graph_label_propagation",
    ],
)
def test_hostile_docs_ops_parity(spark, hostile_dir, duck, name):
    """Round-10 doc-table operators over the hostile corpus: empty text,
    sub-n-gram lengths, non-ASCII, trailing-newline tokens."""
    q = entrymod.queries()[name]
    _assert_parity(q(spark, hostile_dir), duck, name)


def test_hostile_arrow_map_parity(spark, hostile_dir, duck):
    """mapInArrow doc stats on hostile docs — pyarrow's utf8_length /
    utf8_slice_codeunits must agree with DuckDB's codepoint-based
    length()/substring() on non-ASCII text, and '' must stat cleanly."""
    q = entrymod.queries()["arrow_map_doc_stats"]
    _assert_parity(q(spark, hostile_dir), duck, "arrow_map_doc_stats")


def test_hostile_cms_parity(spark, hostile_dir, duck):
    """CMS over the 5-row hostile orders: single hot key, probe keys
    mostly absent (estimate 0 vs collision floor) — md5 bucket math must
    agree exactly."""
    q = entrymod.queries()["agg_count_min_sketch"]
    _assert_parity(q(spark, hostile_dir), duck, "agg_count_min_sketch")
