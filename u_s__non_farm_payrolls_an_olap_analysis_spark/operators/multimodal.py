"""Multimodal column operators (north-star): media as opaque BINARY columns
with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side plumbing is the real deliverable here — schema, batch
iteration, partition-preserving decode — because at 100 TB the pattern is:

    binary payload column + small typed metadata columns
    → ``mapInPandas`` (one Arrow batch at a time, bounded memory)
    → feature columns for downstream relational ops.

The actual codec call is isolated in :func:`decode_media_real`, which
raises ``NotImplementedError`` (image/audio libraries are not in this
container); the pipeline runs a deterministic fake decode with the same
signature so the distributed machinery is fully exercised and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table

DECODE_SCHEMA = (
    "doc_id long, byte_len long, first_byte int, n_frames long, kind string"
)


def decode_media_real(payload: bytes) -> dict:
    """Real media decode — requires PIL/ffmpeg, NOT present in this
    container. The deterministic fake below mirrors this signature; swap it
    in here when codecs are available."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg) are not installed in this environment; "
        "the pipeline uses the deterministic fake decode instead"
    )


def _fake_decode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic fake decode: metadata that a real image/audio decoder
    would emit (byte length, leading byte as a format sniff, frame count at
    a fixed 'frame' stride). One output row per input row; bounded memory
    per Arrow batch."""
    for pdf in batches:
        lens = pdf["media"].apply(len)
        # format-sniff byte: first byte when it is ASCII, else -1 — the
        # ASCII guard keeps the value identical to the oracle's
        # first-CODEPOINT expression (UTF-8 first byte == codepoint only
        # below 128; any non-ASCII leader byte is >= 0xC2)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": lens.astype("int64"),
                "first_byte": pdf["media"]
                .apply(lambda b: b[0] if len(b) and b[0] < 128 else -1)
                .astype("int32"),
                "n_frames": (lens // 100).astype("int64"),
                "kind": pdf["kind"],
            }
        )


def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-decode pipeline over a synthesized binary column: documents'
    text bytes stand in for image payloads (same plumbing, deterministic
    content). BINARY column + metadata in, feature columns out via
    ``mapInPandas``; downstream aggregation stays relational."""
    docs = read_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("media"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image"))
        .otherwise(F.lit("audio"))
        .alias("kind"),
    )
    return media.mapInPandas(_fake_decode_batches, schema=DECODE_SCHEMA)


def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decoded-feature aggregation: relational ops compose on top of the
    decode stage exactly as they would with real codecs."""
    decoded = multimodal_decode_meta(spark, sf_dir)
    return decoded.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("byte_len").alias("total_bytes"),
        F.sum("n_frames").alias("total_frames"),
        F.min("first_byte").alias("min_first_byte"),
        F.max("first_byte").alias("max_first_byte"),
    )


FRAME_STRIDE = 100  # fake-decode frame size in bytes
SAMPLE_EVERY = 4  # keep every 4th frame

SAMPLE_SCHEMA = (
    "doc_id long, kind string, frame_idx long, frame_off long, "
    "remaining_bytes long"
)


def _frame_sample_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Frame sampling: each payload row explodes into one row per SAMPLED
    frame (every ``SAMPLE_EVERY``-th of its ``len // stride`` frames) with
    a payload-derived per-frame feature. The 1→N row shape is the part a
    real video/audio sampler needs from the engine; memory stays bounded
    per Arrow batch (output rows ≤ rows x frames-per-doc). Vectorized:
    the explode is np.repeat/np.concatenate index arithmetic — the only
    Python-level loop is over Arrow batches, never rows."""
    import numpy as np

    for pdf in batches:
        if not len(pdf):
            # zero-row Arrow batch: the starts/kept concatenate below would
            # broadcast-fail (len 1 vs len 0) — nothing to emit
            continue
        n_bytes = pdf["media"].map(len).to_numpy("int64")
        # frames kept per doc = ceil((n // stride) / every)
        kept = -(-(n_bytes // FRAME_STRIDE) // SAMPLE_EVERY)
        doc_ids = np.repeat(pdf["doc_id"].to_numpy("int64"), kept)
        kinds = np.repeat(pdf["kind"].to_numpy(object), kept)
        # per-doc ragged range 0, EVERY, 2*EVERY, ... via one global arange
        # offset by each doc's running start
        starts = np.concatenate(([0], np.cumsum(kept)[:-1]))
        frame_idx = (
            np.arange(int(kept.sum()), dtype="int64")
            - np.repeat(starts, kept)
        ) * SAMPLE_EVERY
        frame_off = frame_idx * FRAME_STRIDE
        remaining = np.repeat(n_bytes, kept) - frame_off
        yield pd.DataFrame(
            {
                "doc_id": doc_ids,
                "kind": kinds,
                "frame_idx": frame_idx,
                "frame_off": frame_off,
                "remaining_bytes": remaining,
            }
        )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — frame sampling over binary media: decode boundary →
    every 4th frame kept → per-frame feature rows for downstream
    relational ops (the video/audio training-data shape). Same synthetic
    payload stand-in as :func:`multimodal_decode_meta`."""
    docs = read_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("media"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image"))
        .otherwise(F.lit("audio"))
        .alias("kind"),
    )
    return media.mapInPandas(_frame_sample_batches, schema=SAMPLE_SCHEMA)


RESIZE_TARGET = 256  # target payload bytes after the fake downsample

RESIZE_SCHEMA = (
    "doc_id long, kind string, orig_bytes long, stride long, "
    "resized_bytes long, resized_first int"
)


def _resize_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic fake resize: keep every ``stride``-th byte so the
    payload lands at ≈``RESIZE_TARGET`` bytes (stride = ceil(n/target)) —
    the byte-slicing stands in for a real thumbnail/downsample codec
    call. The RESIZED PAYLOAD is materialized per row (the plumbing a
    real resize pays: bytes in, new bytes out, bounded per Arrow batch);
    the emitted columns are its verifiable arithmetic so the DuckDB
    oracle can hash-check the operator end to end."""
    for pdf in batches:
        out = {
            "doc_id": pdf["doc_id"].to_numpy("int64"),
            "kind": pdf["kind"].to_numpy(object),
        }
        origs, strides, sizes, firsts = [], [], [], []
        for media in pdf["media"]:
            n = len(media)
            stride = max(1, -(-n // RESIZE_TARGET))
            resized = media[::stride]
            origs.append(n)
            strides.append(stride)
            sizes.append(len(resized))
            firsts.append(
                resized[0] if len(resized) and resized[0] < 128 else -1
            )
        out["orig_bytes"] = origs
        out["stride"] = strides
        out["resized_bytes"] = sizes
        out["resized_first"] = firsts
        yield pd.DataFrame(out).astype(
            {
                "orig_bytes": "int64",
                "stride": "int64",
                "resized_bytes": "int64",
                "resized_first": "int32",
            }
        )


def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — media resize/downsample plumbing: binary in, smaller
    binary out via ``mapInPandas``, deterministic stand-in for the codec
    (see :func:`_resize_batches`; real decode seam documented at
    :func:`decode_media_real`)."""
    docs = read_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("media"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image"))
        .otherwise(F.lit("audio"))
        .alias("kind"),
    )
    return media.mapInPandas(_resize_batches, schema=RESIZE_SCHEMA)


QUERIES = {
    "multimodal_decode_meta": multimodal_decode_meta,
    "multimodal_frame_stats": multimodal_frame_stats,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_resize_stub": multimodal_resize_stub,
}

_DECODED_SQL = (
    "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len, "
    "CAST(CASE WHEN length(text) > 0 AND unicode(text) BETWEEN 0 AND 127 "
    "THEN unicode(text) ELSE -1 END AS INT) AS first_byte, "
    "octet_length(encode(text)) // 100 AS n_frames, "
    "CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind "
    "FROM documents"
)

ORACLE = {
    "multimodal_decode_meta": _DECODED_SQL,
    "multimodal_frame_sample": (
        "WITH m AS (SELECT doc_id, "
        "CAST(octet_length(encode(text)) AS BIGINT) AS n, "
        "CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind "
        "FROM documents) "
        "SELECT doc_id, kind, f AS frame_idx, f * 100 AS frame_off, "
        "n - f * 100 AS remaining_bytes "
        "FROM m, UNNEST(range(0, n // 100, 4)) AS t(f)"
    ),
    "multimodal_frame_stats": (
        f"WITH d AS ({_DECODED_SQL}) "
        "SELECT kind, COUNT(*) AS n_docs, "
        "CAST(SUM(byte_len) AS BIGINT) AS total_bytes, "
        "CAST(SUM(n_frames) AS BIGINT) AS total_frames, "
        "MIN(first_byte) AS min_first_byte, MAX(first_byte) AS max_first_byte "
        "FROM d GROUP BY 1"
    ),
    # python bytes[::stride] keeps ceil(n/stride) bytes starting at 0, so
    # resized_first equals the original first byte under the same ascii
    # sniff as decode_meta
    "multimodal_resize_stub": (
        "WITH m AS (SELECT doc_id, "
        "CAST(octet_length(encode(text)) AS BIGINT) AS n, "
        "CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind, "
        "CAST(CASE WHEN length(text) > 0 AND unicode(text) BETWEEN 0 AND 127 "
        "THEN unicode(text) ELSE -1 END AS INT) AS fb FROM documents), "
        "s AS (SELECT doc_id, kind, n, fb, "
        f"GREATEST(1, (n + {RESIZE_TARGET} - 1) // {RESIZE_TARGET}) AS stride "
        "FROM m) "
        "SELECT doc_id, kind, n AS orig_bytes, stride, "
        "CASE WHEN n = 0 THEN 0 ELSE (n + stride - 1) // stride END "
        "AS resized_bytes, "
        "CASE WHEN n = 0 THEN -1 ELSE fb END AS resized_first FROM s"
    ),
}


# --- Perceptual-hash dedup over the binary media column ---------------------

PHASH_STRIDE = 16  # byte stride of the downsampling stage


def _phash_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Fingerprint stage of a perceptual-hash dedup: downsample the
    payload (every ``PHASH_STRIDE``-th byte — the stand-in for a real
    pHash's resize+DCT+sign step, which needs PIL and is stubbed like
    :func:`decode_media_real`), then hash the sample to a 64-bit code
    (md5 prefix). Deterministic, Arrow-batched, one row out per row in
    — the exact plumbing a real perceptual hash would ride."""
    import hashlib

    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "byte_len": pdf["media"].apply(len).astype("int64"),
                "phash": pdf["media"].apply(
                    lambda b: hashlib.md5(
                        b"ph:" + b[::PHASH_STRIDE]
                    ).hexdigest()[:16]
                ),
            }
        )


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — **perceptual-hash near-dedup over the binary media
    column**: downsample each payload, hash to a 64-bit code, bucket
    by code, report multi-member buckets — the image/audio counterpart
    of `dedup_exact` (exact-byte dedup catches only identical files; a
    perceptual code collapses re-encodes of the same content — here
    the DCT step is a documented deterministic stand-in, the
    `decode_media_real` convention, so the distributed shape is fully
    exercised and oracle-checked).

    Determinism: the fingerprint is a pure function of the payload
    bytes (md5 of the strided sample — the fixture's payloads are
    ASCII text bytes, so the DuckDB twin states the same sample in
    character space); group stats are exact integers.

    Scale: one Arrow-batched ``mapInPandas`` pass (no shuffle), ONE
    hash-keyed aggregate — the same one-hash-groupBy posture as
    `dedup_exact`; no pairwise work."""
    docs = read_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("media"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image"))
        .otherwise(F.lit("audio"))
        .alias("kind"),
    )
    hashed = media.mapInPandas(
        _phash_batches,
        schema="doc_id long, kind string, byte_len long, phash string",
    )
    g = hashed.groupBy("phash").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.min("byte_len").alias("min_bytes"),
        F.max("byte_len").alias("max_bytes"),
    )
    return g.filter(F.col("n_docs") > 1).orderBy("phash")


QUERIES["multimodal_phash_dedup"] = multimodal_phash_dedup

ORACLE["multimodal_phash_dedup"] = (
    "WITH h AS (SELECT doc_id, "
    "CAST(octet_length(encode(text)) AS BIGINT) AS byte_len, "
    "substr(md5('ph:' || array_to_string(list_transform("
    f"range(1, length(text) + 1, {PHASH_STRIDE}), "
    "i -> substring(text, CAST(i AS INT), 1)), '')), 1, 16) AS phash "
    "FROM documents) "
    "SELECT phash, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(MIN(doc_id) AS BIGINT) AS min_doc_id, "
    "CAST(MAX(doc_id) AS BIGINT) AS max_doc_id, "
    "CAST(MIN(byte_len) AS BIGINT) AS min_bytes, "
    "CAST(MAX(byte_len) AS BIGINT) AS max_bytes "
    "FROM h GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY phash"
)
