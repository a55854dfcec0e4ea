"""Multimodal column plumbing — binary payloads with typed metadata.

A 100 TB training-data corpus carries image/audio/video payloads as opaque
`binary` columns beside typed metadata. The real decode libraries are not in
this container, so the DECODE step is a clearly-marked stub
(`decode_image` raises NotImplementedError); everything Spark-side — schema,
Arrow batch shape, mapInPandas signature, partition behavior — is real and
tested. The deterministic byte-feature extractor stands in for a decoder so
the distributed plumbing has verifiable output.

Mirrors the reference's treatment of file bytes as opaque content + metadata
(path/size/modtime/hash, /root/reference/indexer/scanner.go:100-112) and its
binary sniffing (indexer/scanner.go:305-312).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

N_FEATURE_BUCKETS = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_features", ArrayType(FloatType())),
    ]
)


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize the opaque payload column + typed metadata struct.

    In production this column arrives from the source table; here the payload
    is the UTF-8 bytes of the text (deterministic), with media metadata the
    way a real multimodal table would carry it.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.length(payload).alias("n_bytes"),
            F.lit(1).alias("n_frames"),
        ).alias("media_meta"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Real image decode — requires PIL/libjpeg, absent in this container.

    STUB: the Spark-side contract (binary in, HxWxC array out, called from
    extract_features' pandas batches) is what production swaps in.
    """
    raise NotImplementedError(
        "image decode requires an image library not present in this "
        "environment; use extract_features (deterministic byte features) "
        "for plumbing tests"
    )


def extract_features(
    media: DataFrame, n_buckets: int = N_FEATURE_BUCKETS
) -> DataFrame:
    """mapInPandas feature extractor over the binary payload.

    One Python invocation per Arrow batch (vectorized — no per-row Python
    from Spark's perspective); per batch it computes an L1-normalized
    `n_buckets`-bin byte histogram per payload. This is the exact seam where
    a real decoder (decode_image + a vision tower) plugs in: same schema,
    same batch shape, same partitioning (narrow map — no shuffle).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            sizes = []
            for payload in pdf["payload"]:
                buf = np.frombuffer(payload or b"", dtype=np.uint8)
                sizes.append(len(buf))
                if len(buf) == 0:
                    feats.append([0.0] * n_buckets)
                    continue
                hist = np.bincount(buf // (256 // n_buckets), minlength=n_buckets)
                feats.append((hist / hist.sum()).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "byte_features": feats,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


FRAME_BYTES = 64
FRAME_SAMPLE_EVERY = 4

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_features", ArrayType(FloatType())),
    ]
)


def frame_sample(
    media: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    every: int = FRAME_SAMPLE_EVERY,
    n_buckets: int = N_FEATURE_BUCKETS,
) -> DataFrame:
    """Frame-sampling plumbing: treat the payload as fixed-size frames (the
    video/audio analog), keep every `every`-th frame, and emit per-frame
    byte features. mapInPandas — one Python call per Arrow batch; output is
    a flatMap (multiple frame rows per doc), the same shape a real
    video-frame sampler produces. A real decoder swaps in at the same seam
    as extract_features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = np.frombuffer(payload or b"", dtype=np.uint8)
                n_frames = (len(buf) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, every):
                    frame = buf[fi * frame_bytes : (fi + 1) * frame_bytes]
                    hist = np.bincount(
                        frame // (256 // n_buckets), minlength=n_buckets
                    )
                    s = hist.sum()
                    ids.append(doc_id)
                    idxs.append(fi)
                    feats.append(
                        (hist / s).astype(np.float32).tolist()
                        if s
                        else [0.0] * n_buckets
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_features": feats,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


def frame_meta(
    docs: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    every: int = FRAME_SAMPLE_EVERY,
) -> DataFrame:
    """Oracle-checkable frame accounting: total and sampled frame counts per
    doc, derivable from byte length alone (JVM-side, no Python)."""
    m = attach_binary(docs)
    n_frames = F.ceil(F.col("media_meta.n_bytes") / F.lit(frame_bytes)).cast(
        "long"
    )
    sampled = F.ceil(n_frames / F.lit(every)).cast("long")
    return m.select(
        "doc_id",
        F.col("media_meta.n_bytes").cast("long").alias("n_bytes"),
        n_frames.alias("n_frames"),
        sampled.alias("n_sampled"),
    )


def frame_meta_oracle(
    frame_bytes: int = FRAME_BYTES, every: int = FRAME_SAMPLE_EVERY
) -> str:
    return f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(ceil(octet_length(encode(text)) / CAST({frame_bytes} AS DOUBLE)) AS BIGINT) AS n_frames,
       CAST(ceil(ceil(octet_length(encode(text)) / CAST({frame_bytes} AS DOUBLE)) / CAST({every} AS DOUBLE)) AS BIGINT) AS n_sampled
FROM documents
""".strip()


def media_meta(docs: DataFrame) -> DataFrame:
    """Flat metadata projection (oracle-checkable: byte length parity)."""
    m = attach_binary(docs)
    return m.select(
        "doc_id",
        F.col("media_meta.format").alias("format"),
        F.col("media_meta.n_bytes").cast("long").alias("n_bytes"),
    )


def media_meta_oracle() -> str:
    return (
        "SELECT doc_id, 'text/plain' AS format,"
        " CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes"
        " FROM documents"
    )
