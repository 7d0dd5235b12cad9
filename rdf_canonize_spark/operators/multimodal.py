"""Multimodal column handling: opaque ``binary`` payloads + typed
metadata, processed through Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the *decode* kernels are
stubbed exactly as the task prescribes: a clearly-marked
``NotImplementedError`` path behind an import-try, with a
deterministic fake used in its place.  Everything Spark-side is real
and tested: schema, binary transport through Arrow, batch iteration
shape, partition-parallel execution.

At 100 TB the important properties are the ones this module does
implement: payload bytes cross the JVM->Python boundary once per batch
(Arrow buffers, no per-row pickling); feature extraction is
embarrassingly parallel (``mapInPandas``, no shuffle); outputs are
fixed-width columns so downstream joins/aggs stay columnar.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

try:  # decode libraries are not in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

MEDIA_FEATURE_DIM = 8

MEDIA_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("media_type", StringType(), True),
        StructField("media_len", IntegerType(), True),
        StructField("media_sha256", StringType(), True),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("decode_status", StringType(), True),
    ]
)


def attach_media(pages_df):
    """Treat the page payload as an opaque media column with typed
    metadata -- the multimodal table shape (url, media, media_type)."""
    return pages_df.select(
        "url",
        F.col("html").alias("media"),
        F.lit("text/html").alias("media_type"),
    )


def _decode_image(payload: bytes):
    """REAL decode path -- unavailable in this container.

    Raises ``NotImplementedError`` unless PIL is importable; callers
    fall back to ``_fake_feature``.  On a production cluster this is
    where ``Image.open(io.BytesIO(payload))`` + resize/frame-sample
    would run, still inside the same Arrow batch loop.
    """
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL; container has no decode libs"
        )
    raise NotImplementedError("real decode path not exercised in sandbox")


def _fake_feature(payload: bytes):
    """Deterministic stand-in feature: 8 floats derived from the
    payload digest (stable across partitioning and retries)."""
    digest = hashlib.sha256(payload).digest()
    return [
        round(int.from_bytes(digest[4 * i: 4 * i + 4], "big")
              / 2 ** 32, 6)
        for i in range(MEDIA_FEATURE_DIM)
    ]


def extract_media_features(media_df):
    """Arrow-batched feature extraction over binary payloads."""

    def run(batches):
        for pdf in batches:
            urls = pdf["url"].tolist()
            payloads = pdf["media"].tolist()
            types = pdf["media_type"].tolist()
            out = {
                "url": [], "media_type": [], "media_len": [],
                "media_sha256": [], "feature": [], "decode_status": [],
            }
            for url, payload, mtype in zip(urls, payloads, types):
                payload = bytes(payload) if payload is not None else b""
                try:
                    _decode_image(payload)
                    status = "decoded"
                    feat = None  # unreachable in sandbox
                except NotImplementedError:
                    status = "stubbed"
                    feat = _fake_feature(payload)
                out["url"].append(url)
                out["media_type"].append(mtype)
                out["media_len"].append(len(payload))
                out["media_sha256"].append(
                    hashlib.sha256(payload).hexdigest()
                )
                out["feature"].append(feat)
                out["decode_status"].append(status)
            yield pd.DataFrame(out)

    return media_df.mapInPandas(run, MEDIA_SCHEMA)


FRAME_SIZE = 256
FRAME_EVERY = 3

FRAME_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("frame_idx", IntegerType(), True),
        StructField("frame_offset", IntegerType(), True),
        StructField("frame_len", IntegerType(), True),
        StructField("frame_sha256", StringType(), True),
        StructField("decode_status", StringType(), True),
    ]
)


def sample_frames(media_df, frame_size=FRAME_SIZE, every=FRAME_EVERY):
    """Frame sampling for video-like payloads: slice the binary into
    fixed-size frames, keep every ``every``-th, one OUTPUT ROW PER
    SAMPLED FRAME -- the 1->n exploding batch shape (vs the 1:1
    extractor above), still a single Arrow-batched ``mapInPandas``
    with no shuffle.  The real frame decoder/resizer sits behind the
    same stubbed gate as ``_decode_image``; the byte slicing, offsets,
    and per-frame digests are real and oracle-checked.

    Digest portability: the frame digest is sha256 of the frame's
    LOWERCASE HEX representation (not the raw bytes) because the
    sandbox DuckDB can neither slice nor hash BLOBs -- hex framing
    keeps the oracle able to recompute every digest (it slices
    ``lower(hex(payload))`` at doubled offsets).  Content-equality
    semantics are identical (hexlify is injective)."""

    def run(batches):
        for pdf in batches:
            out = {
                "url": [], "frame_idx": [], "frame_offset": [],
                "frame_len": [], "frame_sha256": [],
                "decode_status": [],
            }
            for url, payload in zip(pdf["url"].tolist(),
                                    pdf["media"].tolist()):
                payload = bytes(payload) if payload is not None else b""
                n_frames = -(-len(payload) // frame_size)
                for idx in range(0, n_frames, every):
                    off = idx * frame_size
                    frame = payload[off: off + frame_size]
                    try:
                        _decode_image(frame)
                        status = "decoded"
                    except NotImplementedError:
                        status = "stubbed"
                    out["url"].append(url)
                    out["frame_idx"].append(idx)
                    out["frame_offset"].append(off)
                    out["frame_len"].append(len(frame))
                    out["frame_sha256"].append(
                        hashlib.sha256(frame.hex().encode()).hexdigest()
                    )
                    out["decode_status"].append(status)
            yield pd.DataFrame(out)

    return media_df.mapInPandas(run, FRAME_SCHEMA)
