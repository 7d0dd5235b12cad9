"""Multimodal column handling: opaque ``binary`` payloads + typed
metadata, processed through Arrow-batched ``mapInPandas``.

The decode layer is REAL for uncompressed raster formats -- 24-bit
BMP and binary PPM parse in pure Python + numpy (header + pixel
stats), no library dependency -- and falls back to a deterministic
digest feature (status 'stubbed') for payloads outside that coverage;
PIL, behind an import-try, extends coverage to compressed formats on
a production cluster.  Everything Spark-side is likewise real and
tested: schema, binary transport through Arrow, batch iteration
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


def _bmp_pixels(payload: bytes):
    """Pure-Python decode of an uncompressed 24-bit BMP
    (BITMAPINFOHEADER, BI_RGB): returns (width, height,
    arr[height, width, 3] uint8 RGB, top-down row order).  Raises
    ValueError on a malformed or unsupported BMP (truncated header,
    compressed, non-24-bit)."""
    import struct

    import numpy as np

    if len(payload) < 54:
        raise ValueError("BMP truncated header")
    data_off, = struct.unpack_from("<I", payload, 10)
    dib_size, = struct.unpack_from("<I", payload, 14)
    if dib_size < 40:
        raise ValueError("BMP unsupported DIB header")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp, = struct.unpack_from("<H", payload, 28)
    compression, = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError("BMP unsupported (need 24-bit BI_RGB)")
    rows = abs(height)
    if width <= 0 or rows == 0:
        raise ValueError("BMP bad dimensions")
    stride = ((width * 3 + 3) // 4) * 4
    need = data_off + stride * rows
    if len(payload) < need:
        raise ValueError("BMP truncated pixel data")
    px = (
        np.frombuffer(payload, dtype=np.uint8,
                      count=stride * rows, offset=data_off)
        .reshape(rows, stride)[:, : width * 3]
        .reshape(rows, width, 3)[:, :, ::-1]  # BMP stores BGR
    )
    if height > 0:  # positive height = bottom-up storage
        px = px[::-1]
    return width, rows, px


def _parse_bmp(payload: bytes):
    """Mean-pixel wrapper over ``_bmp_pixels``: returns (width,
    height, mean_r, mean_g, mean_b)."""
    width, rows, px = _bmp_pixels(payload)
    means = px.reshape(-1, 3).astype("float64").mean(axis=0)
    return width, rows, float(means[0]), float(means[1]), float(means[2])


def _ppm_pixels(payload: bytes):
    """Pure-Python decode of a binary PPM (P6, maxval <= 255):
    returns (width, height, arr[height, width, 3] uint8 RGB, maxval).
    Raises ValueError on malformed input.  Header = 'P6', then
    whitespace/comment-separated width height maxval, one whitespace,
    then raw RGB."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not P6")
    pos = 2
    fields = []
    while len(fields) < 3:
        # skip whitespace and '#' comments
        while pos < len(payload) and payload[pos: pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos: pos + 1] == b"#":
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise ValueError("PPM truncated comment")
            pos = nl + 1
            continue
        start = pos
        while pos < len(payload) and payload[pos: pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("PPM bad header field")
        fields.append(int(payload[start:pos]))
    if pos >= len(payload) or not payload[pos: pos + 1].isspace():
        raise ValueError("PPM missing header terminator")
    pos += 1
    width, height, maxval = fields
    if width <= 0 or height <= 0 or not (0 < maxval <= 255):
        raise ValueError("PPM unsupported dimensions/maxval")
    need = width * height * 3
    if len(payload) - pos < need:
        raise ValueError("PPM truncated pixel data")
    px = np.frombuffer(
        payload, dtype=np.uint8, count=need, offset=pos
    ).reshape(height, width, 3)
    return width, height, px, maxval


def _parse_ppm(payload: bytes):
    """Mean-pixel wrapper over ``_ppm_pixels``: returns (width,
    height, mean_r, mean_g, mean_b), scaled to a 255 maxval."""
    width, height, px, maxval = _ppm_pixels(payload)
    means = px.reshape(-1, 3).astype("float64").mean(axis=0) * (
        255.0 / maxval
    )
    return width, height, float(means[0]), float(means[1]), float(means[2])


def _decode_image(payload: bytes):
    """REAL decode path, no library dependency: uncompressed BMP and
    binary PPM are parsed in pure Python + numpy (header + pixel
    stats).  Returns (width, height, mean_r, mean_g, mean_b) or None
    when the payload is not a supported raster format (callers then
    keep the deterministic digest feature with status 'stubbed').
    Raises ValueError on a recognized-but-malformed payload (status
    'decode-error').

    On a production cluster PIL extends coverage to compressed
    formats (``Image.open(io.BytesIO(payload))``, same return shape,
    still inside the same Arrow batch loop); the import-try keeps
    that optional."""
    if payload[:2] == b"BM":
        return _parse_bmp(payload)
    if payload[:2] == b"P6":
        return _parse_ppm(payload)
    if _HAVE_PIL:
        import io

        import numpy as np

        img = Image.open(io.BytesIO(payload)).convert("RGB")
        arr = np.asarray(img, dtype=np.float64).reshape(-1, 3)
        m = arr.mean(axis=0)
        return img.width, img.height, float(m[0]), float(m[1]), float(m[2])
    return None


def _decoded_feature(width, height, mean_r, mean_g, mean_b):
    """Fixed-width [0,1] feature vector from real decode stats:
    normalized dims, per-channel means, grayscale mean, pixel count.
    Deterministic pure function of the decoded stats."""
    gray = (mean_r + mean_g + mean_b) / 3.0
    return [
        round(min(width / 4096.0, 1.0), 6),
        round(min(height / 4096.0, 1.0), 6),
        round(mean_r / 255.0, 6),
        round(mean_g / 255.0, 6),
        round(mean_b / 255.0, 6),
        round(gray / 255.0, 6),
        round(min(width * height / 2.0 ** 24, 1.0), 6),
        0.0,
    ]


def _fake_feature(payload: bytes):
    """Deterministic stand-in feature for non-raster payloads: 8
    floats derived from the payload digest (stable across
    partitioning and retries)."""
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
                    stats = _decode_image(payload)
                except ValueError:
                    stats = None
                    status = "decode-error"
                    feat = _fake_feature(payload)
                else:
                    if stats is None:
                        status = "stubbed"
                        feat = _fake_feature(payload)
                    else:
                        status = "decoded"
                        feat = _decoded_feature(*stats)
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
                        status = (
                            "decoded" if _decode_image(frame) is not None
                            else "stubbed"
                        )
                    except ValueError:
                        status = "decode-error"
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


# perceptual-hash parameters: an 8x8 average hash is 64 bits = 16 hex
# chars, banded into 4 x 16-bit bands for the candidate join.  With 4
# bands, two hashes within Hamming distance 3 MUST agree on at least
# one band (pigeonhole), so the banded join is EXACT -- zero recall
# loss -- up to AHASH_MAX_HAMMING = 3.
AHASH_GRID = 8
AHASH_BANDS = 4
AHASH_MAX_HAMMING = 3

AHASH_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("ahash", StringType(), True),
        StructField("decode_status", StringType(), True),
    ]
)


def _ahash_hex(px, grid=AHASH_GRID):
    """Average hash of a decoded raster: grayscale, nearest-neighbor
    sample to ``grid x grid`` (always valid, even below grid size),
    threshold at the sample mean, bits row-major MSB-first -> 16 hex
    chars.  Deterministic pure function of the pixel array."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    gray = px.astype(np.float64).mean(axis=2)
    ri = ((np.arange(grid) + 0.5) * h / grid).astype(int)
    ci = ((np.arange(grid) + 0.5) * w / grid).astype(int)
    samp = gray[np.ix_(ri, ci)]
    if samp.max() == samp.min():
        # zero-variance raster: 'bit = sample >= mean' is all-true, so
        # EVERY flat image (solid black, solid white, placeholder
        # tiles) would collapse to one hash and one giant false
        # near-dup bucket -- signal the caller to use the content hash
        return None
    bits = (samp >= samp.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return format(val, "0%dx" % (grid * grid // 4))


def image_ahash(media_df, grid=AHASH_GRID):
    """Perceptual image hashing for near-duplicate detection: a REAL
    average hash (grayscale -> grid sample -> mean threshold) for
    payloads the pure-Python raster decoders cover (24-bit BMP, P6
    PPM), and a deterministic content-hash fallback (first 16 hex of
    the payload sha256 -- the exact-dup key, recomputable in SQL) for
    everything else.  Output ``(url, ahash, decode_status)``.

    Same Arrow-batched ``mapInPandas`` shape as the feature extractor:
    payload bytes cross the JVM boundary once per batch, no shuffle,
    embarrassingly parallel."""

    def run(batches):
        for pdf in batches:
            out = {"url": [], "ahash": [], "decode_status": []}
            for url, payload in zip(pdf["url"].tolist(),
                                    pdf["media"].tolist()):
                payload = bytes(payload) if payload is not None else b""
                try:
                    if payload[:2] == b"BM":
                        _, _, px = _bmp_pixels(payload)
                        ah, status = _ahash_hex(px, grid), "decoded"
                    elif payload[:2] == b"P6":
                        _, _, px, _ = _ppm_pixels(payload)
                        ah, status = _ahash_hex(px, grid), "decoded"
                    else:
                        ah = hashlib.sha256(payload).hexdigest()[:16]
                        status = "stubbed"
                    if status == "decoded" and ah is None:
                        # flat raster: perceptual bits are degenerate;
                        # the content hash keeps identical flat images
                        # as exact pairs without a false mega-bucket
                        ah = hashlib.sha256(payload).hexdigest()[:16]
                        status = "decoded-flat"
                except ValueError:
                    ah = hashlib.sha256(payload).hexdigest()[:16]
                    status = "decode-error"
                out["url"].append(url)
                out["ahash"].append(ah)
                out["decode_status"].append(status)
            yield pd.DataFrame(out)

    return media_df.mapInPandas(run, AHASH_SCHEMA)


def ahash_near_dups(hashes_df, max_hamming=AHASH_MAX_HAMMING):
    """Near-duplicate image pairs from a ``(url, ahash)`` table: band
    each 64-bit hash into 4 x 16-bit hex bands, equi-join on
    (band_idx, band_value), then verify exact Hamming distance with
    per-band bit_count(xor) -- all Catalyst, no Python.  Output
    ``(url_a, url_b, hamming)``, ``url_a < url_b``.

    EXACT for ``max_hamming <= AHASH_BANDS - 1``: if every band
    differed the distance would be >= 4 (pigeonhole), so every
    qualifying pair shares a band and survives the candidate join --
    this is banded LSH with zero recall loss, the same
    bound-the-candidates shape as the MinHash path (dedup.lsh_bands).

    Scale shape: one explode (4 rows/hash) -> one (band, value)
    equi-join -- candidates are bounded by band-bucket occupancy,
    never all-pairs -- -> distinct -> a per-pair O(1) verify.  Band
    values spread uniformly for real perceptual hashes; a pathological
    bucket (e.g. the all-black-images band) is the standard AQE
    skew-join case."""
    if max_hamming >= AHASH_BANDS:
        raise ValueError(
            "banded candidates are exact only for max_hamming <= "
            f"{AHASH_BANDS - 1}; got {max_hamming}"
        )
    bands = hashes_df.select(
        "url",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("b"),
                        F.substring("ahash", 1 + 4 * i, 4).alias("v"),
                    )
                    for i in range(AHASH_BANDS)
                ]
            )
        ).alias("bd"),
    ).select(
        "url", "ahash", F.col("bd.b").alias("b"), F.col("bd.v").alias("v")
    ).localCheckpoint()
    # eager checkpoint: bands feeds BOTH sides of the self-join, and a
    # broadcast join never produces a ReusedExchange -- without it the
    # upstream subtree (including an image_ahash raster decode, when
    # composed) executes twice (CLAUDE.md multi-branch rule)
    left = bands.select(
        F.col("url").alias("url_a"),
        F.col("ahash").alias("ahash_a"),
        "b",
        "v",
    )
    right = bands.select(
        F.col("url").alias("url_b"),
        F.col("ahash").alias("ahash_b"),
        "b",
        "v",
    )
    cand = (
        left.join(right, ["b", "v"])
        .filter(F.col("url_a") < F.col("url_b"))
        .select("url_a", "url_b", "ahash_a", "ahash_b")
        .distinct()
    )
    hamming = None
    for i in range(AHASH_BANDS):
        va = F.conv(
            F.substring("ahash_a", 1 + 4 * i, 4), 16, 10
        ).cast("int")
        vb = F.conv(
            F.substring("ahash_b", 1 + 4 * i, 4), 16, 10
        ).cast("int")
        term = F.bit_count(va.bitwiseXOR(vb))
        hamming = term if hamming is None else hamming + term
    return (
        cand.select(
            "url_a", "url_b", hamming.cast("int").alias("hamming")
        )
        .filter(F.col("hamming") <= max_hamming)
    )
