"""Multimodal columns (SURVEY.md §2.9): opaque binary payloads + typed
metadata, processed with Arrow-batched pandas over ``mapInPandas``.

The reference stops at a poster *URL* string (src/movie.py:190-191,203);
a multimodal training pipeline carries the bytes. Design:

* media rides as a ``BinaryType`` column next to typed metadata — Parquet
  stores it page-compressed, scans prune it unless projected;
* decode / feature-extraction runs in ``mapInPandas`` (one Python worker
  per partition, Arrow batches — never row-at-a-time UDFs);
* real codecs (PIL/ffmpeg) are not in this image, so ``decode_image`` is an
  explicit NotImplementedError stub; the *pipeline plumbing* — binary
  schema, batch iteration, deterministic feature extraction — is real and
  oracle-checked end-to-end (the fake "decoder" derives features from the
  bytes deterministically, so DuckDB can verify every value).

Scale notes: feature extraction is per-row with no shuffle; partition sizes
should target ~128 MB of payload (spark.sql.files.maxPartitionBytes), and
the binary column must be pruned out of any query that doesn't project it
— which Parquet + column pruning give for free.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import load_table
from ..registry import register

__all__ = ["attach_binary_payload", "extract_features", "decode_image"]


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("payload_md5", T.StringType(), True),
        T.StructField("fake_width", T.IntegerType(), True),
        T.StructField("fake_height", T.IntegerType(), True),
    ]
)


def decode_image(payload: bytes):
    """Real image decode requires PIL/opencv — not in this image.

    The Spark-side contract (binary in, array/struct out via mapInPandas)
    is exercised by ``extract_features`` with a deterministic fake.
    """
    raise NotImplementedError(
        "image codecs unavailable in this environment; "
        "plug PIL.Image.open(io.BytesIO(payload)) here on a real cluster"
    )


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Materialize a binary media column (here: utf-8 bytes of the text —
    a deterministic stand-in for fetched image bytes, same plumbing)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic fake decoder: byte length, md5, and a "resolution"
    derived from the length — stands in for width/height/channels of a real
    decode while keeping the output oracle-checkable.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int32"),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "fake_width": (64 + n_bytes % 512).astype("int32"),
                    "fake_height": (64 + (n_bytes * 7) % 512).astype("int32"),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER)              AS n_bytes,
           md5(text)                                                AS payload_md5,
           CAST(64 + octet_length(encode(text)) % 512 AS INTEGER)   AS fake_width,
           CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INTEGER) AS fake_height
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_binary_payload(docs))


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("frame_offset", T.IntegerType(), True),
        T.StructField("frame_md5", T.StringType(), True),
    ]
)

N_FRAMES = 4


def sample_frames(media: DataFrame, n_frames: int = N_FRAMES) -> DataFrame:
    """Frame sampling over binary payloads: one media row → n evenly-spaced
    "frames" (here: fixed-width byte slices — a real video decoder plugs in
    at the marked line; the row-expanding Arrow plumbing is identical).

    mapInPandas keeps the expansion streaming: each Arrow batch yields its
    frame rows without materializing the whole partition.
    """

    def batches(it):
        import hashlib

        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    off = min(i * step, max(len(b) - 1, 0))
                    # real impl: decode frame at timestamp i/n — needs ffmpeg
                    frame = b[off : off + 16]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(off)
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH frames AS (
        SELECT doc_id, text,
               octet_length(encode(text)) AS n_bytes,
               GREATEST(octet_length(encode(text)) // {N_FRAMES}, 1) AS step,
               UNNEST(range(0, {N_FRAMES})) AS frame_idx
        FROM documents
    )
    SELECT doc_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(LEAST(frame_idx * step, GREATEST(n_bytes - 1, 0)) AS INTEGER) AS frame_offset,
           md5(substr(text, CAST(LEAST(frame_idx * step, GREATEST(n_bytes - 1, 0)) AS INTEGER) + 1, 16))
               AS frame_md5
    FROM frames
    """,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample the fake media payloads: 4 evenly-spaced 16-byte frames
    per document (ASCII text ⇒ byte slicing == char slicing, so the oracle
    can mirror the Python slice with substr)."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_binary_payload(docs))


_BLOCK = 64  # fixed block size (chars == bytes for the ASCII payloads)


@register(
    "multimodal_block_dedup",
    oracle=f"""
    WITH b AS (
        SELECT doc_id,
               md5(substr(text, CAST(i * {_BLOCK} + 1 AS BIGINT), {_BLOCK}))
                 AS block_md5
        FROM documents,
             UNNEST(range(0, (length(text) + {_BLOCK} - 1) // {_BLOCK})) AS t(i)
    )
    SELECT CAST(COUNT(*) AS BIGINT)                    AS total_blocks,
           CAST(COUNT(DISTINCT block_md5) AS BIGINT)   AS distinct_blocks,
           CAST(COUNT(DISTINCT block_md5) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE)                AS unique_ratio
    FROM b
    """,
)
def block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-block content dedup over media payloads: split every payload
    into {_BLOCK}-byte blocks, fingerprint each, and measure corpus-level
    block redundancy — the storage-dedup statistic (how much a
    content-addressed block store would save) that document-level dedup
    can't see. The ASCII payload contract (multimodal.attach_binary_payload)
    makes char blocks == byte blocks, so the oracle mirrors the slicing
    exactly.

    Scale shape: the explode emits len/{_BLOCK} rows per payload and the
    distinct-count is a hash aggregate with map-side partials — no state
    beyond |distinct blocks|. At 100 TB one would swap fixed blocks for
    content-defined chunking (rolling-hash boundaries, same downstream
    plan) so insertions don't shift every subsequent block; fixed blocks
    keep the oracle exactly mirrorable here."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                ((F.length("text") + _BLOCK - 1) / _BLOCK).cast("long") - 1,
            )
        ).alias("i"),
        F.col("text"),
    ).select(
        F.md5(
            F.expr(f"substring(text, CAST(i * {_BLOCK} + 1 AS INT), {_BLOCK})")
        ).alias("block_md5")
    )
    return b.agg(
        F.count(F.lit(1)).alias("total_blocks"),
        F.countDistinct("block_md5").alias("distinct_blocks"),
        (
            F.countDistinct("block_md5").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("unique_ratio"),
    )


# -- content-defined chunking (the fixed-block scale swap, made real) ---------

import hashlib as _hashlib

_CDC_MASK = 0x3F  # boundary when (h & mask) == 0 -> ~64 B average chunks
_CDC_MIN = 16  # never cut before MIN bytes (suppresses tiny chunks)
_CDC_MAX = 256  # forced cut at MAX bytes (bounds worst-case chunk)

#: Gear table: byte -> pseudo-random 32-bit word, derived from md5 so any
#: re-implementation (tests, another engine, another language) regenerates
#: the identical table without sharing state.
_GEAR = [
    int(_hashlib.md5(f"gear_{b}".encode()).hexdigest()[:8], 16)
    for b in range(256)
]


def cdc_chunk_spans(data: bytes) -> list[tuple[int, int]]:
    """Gear-hash content-defined chunk spans [(start, end), ...) over raw
    bytes (FastCDC's core loop, simplified: single mask, no normalized
    chunking). A boundary is declared after byte i when the rolling hash
    masks to zero and the chunk has reached _CDC_MIN bytes; _CDC_MAX forces
    a cut. The hash restarts per chunk, so a boundary depends only on the
    bytes SINCE the previous boundary — the locality that makes insertions
    shift O(1) chunks instead of every subsequent block (the fixed-block
    failure mode multimodal_block_dedup documents)."""
    spans: list[tuple[int, int]] = []
    start = 0
    h = 0
    for i, byte in enumerate(data):
        h = ((h << 1) + _GEAR[byte]) & 0xFFFFFFFF
        length = i - start + 1
        if (length >= _CDC_MIN and (h & _CDC_MASK) == 0) or length >= _CDC_MAX:
            spans.append((start, i + 1))
            start = i + 1
            h = 0
    if start < len(data):
        spans.append((start, len(data)))
    return spans


def _cdc_stats_batches(batches):
    import pandas as pd

    for pdf in batches:
        rows = []
        for payload in pdf["payload"]:
            data = bytes(payload)
            for s, e in cdc_chunk_spans(data):
                rows.append(
                    (
                        _hashlib.md5(data[s:e]).hexdigest(),
                        e - s,
                    )
                )
        yield pd.DataFrame(rows, columns=["chunk_md5", "chunk_len"])


@register("multimodal_cdc_chunk_dedup")  # no SQL oracle: see docstring
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunk dedup over media payloads — the 100 TB swap
    the fixed-block row (multimodal_block_dedup) documents, implemented:
    Gear rolling-hash boundaries (mapInPandas, Arrow-batched), chunk
    fingerprints, corpus redundancy stats in one hash aggregate.

    NO SQL ORACLE on purpose: a per-byte rolling hash with min/max chunk
    clamps is a sequential recurrence no set-oriented SQL reproduces
    without a byte-level recursive CTE (neither engine can do that at
    useful cost), so this entry takes the driver's weaker rows-only check.
    The SEMANTICS are pinned instead by tests/test_engine_ops.py:
    reconstruction (chunks concatenate back to every payload), size
    bounds, per-chunk locality, and the shift-resilience property that
    justifies CDC over fixed blocks (an insertion re-chunks O(1) chunks,
    not every subsequent one).

    Scale shape: chunking is map-only (each payload visits one Python
    worker once, no state); the dedup statistic is the same partial-agg
    distinct-count plan as the fixed-block row. Chunk hashes, not chunk
    bytes, cross the exchange."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = attach_binary_payload(docs).select("payload")
    chunks = payloads.mapInPandas(
        _cdc_stats_batches, "chunk_md5 string, chunk_len long"
    )
    return chunks.agg(
        F.count(F.lit(1)).alias("total_chunks"),
        F.countDistinct("chunk_md5").alias("distinct_chunks"),
        (
            F.countDistinct("chunk_md5").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("unique_ratio"),
        F.sum("chunk_len").alias("total_bytes"),
    )
