"""Multimodal column plumbing (north-star: image/audio/video as opaque
binary columns with typed metadata).

The decode step is REAL: pure-Python/numpy codecs for 24-bit BMP and binary
P6 PPM (`decode_image`), with matching encoders for planting deterministic
test images. No PIL/opencv needed for these formats; exotic formats raise
ValueError and are tagged fmt='error' rather than failing the batch.
Everything Spark-side is likewise real and tested: the binary column
schema, Arrow batch shape through `mapInPandas`, partition-preserving
feature extraction, and frame-sampling explode.

Design for 100 TB of media:
* payloads stay opaque `binary`; metadata (mime, n_bytes, checksum) lives in
  ordinary columns so filters/pruning never touch the blobs;
* feature extraction is `mapInPandas` (Arrow-batched, one Python worker per
  partition) — NEVER a row-at-a-time UDF;
* decoded features are small fixed-width columns, so downstream joins/aggs
  shuffle features, not payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import struct

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, header_hex string, fake_width int, fake_height int"
)
IMAGE_FEATURE_SCHEMA = (
    "doc_id bigint, fmt string, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)
FRAME_SCHEMA = "doc_id bigint, frame_index int, frame_checksum string"


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media payload: the UTF-8 bytes of the text column
    standing in for image bytes. Schema shape matches a real media table:
    (id, payload binary, mime string, n_bytes int)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("mime"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
    )


# ---------------------------------------------------------------------------
# Real pure-Python image codecs (no PIL/opencv in the container, none needed
# for these formats). BMP: 24-bit uncompressed (BI_RGB), the classic
# bottom-up row order with 4-byte row padding, top-down (negative height)
# also handled. PPM: binary P6, maxval 255. Together they make the
# mapInPandas media path END-TO-END real: header parse, padded pixel walk,
# BGR→RGB channel order, per-channel statistics.
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, rows: list[list[tuple[int, int, int]]]) -> bytes:
    """24-bit BI_RGB BMP from RGB rows (rows[0] = top row). Bottom-up pixel
    array, rows padded to 4 bytes — the standard layout."""
    pad = (-width * 3) % 4
    body = bytearray()
    for row in reversed(rows):  # bottom-up
        for r, g, b in row:
            body += bytes((b, g, r))  # BMP stores BGR
        body += b"\x00" * pad
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header + info + body)


def encode_ppm(width: int, height: int, rows: list[list[tuple[int, int, int]]]) -> bytes:
    """Binary P6 PPM from RGB rows (top-down, no padding)."""
    body = bytearray()
    for row in rows:
        for r, g, b in row:
            body += bytes((r, g, b))
    return b"P6\n%d %d\n255\n" % (width, height) + bytes(body)


def decode_image(payload: bytes) -> tuple[str, int, int, float, float, float]:
    """Decode a BMP (24-bit BI_RGB) or PPM (P6) payload.

    Returns (fmt, width, height, mean_r, mean_g, mean_b) where means are
    exact integer-sum / pixel-count doubles (deterministic — no float
    accumulation order). Raises ValueError on anything unrecognized, so
    callers can tag undecodable payloads instead of crashing the batch.
    """
    raw = bytes(payload)
    if raw[:2] == b"BM":
        return ("bmp",) + _decode_bmp(raw)
    if raw[:2] == b"P6":
        return ("ppm",) + _decode_ppm(raw)
    raise ValueError("unrecognized image format (expected BMP or P6 PPM)")


def _decode_bmp(raw: bytes) -> tuple[int, int, float, float, float]:
    if len(raw) < 54:
        raise ValueError("truncated BMP header")
    pixel_offset = struct.unpack_from("<I", raw, 10)[0]
    header_size, width, height = struct.unpack_from("<Iii", raw, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", raw, 26)
    if header_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed (BI_RGB) BMP supported")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError("bad BMP dimensions")
    stride = width * 3 + ((-width * 3) % 4)
    if pixel_offset + stride * height > len(raw):
        raise ValueError("truncated BMP pixel array")
    import numpy as np

    arr = np.frombuffer(raw, np.uint8, stride * height, pixel_offset)
    # drop row padding, reshape to (pixels, BGR); integer sums are exact
    px = arr.reshape(height, stride)[:, : width * 3].reshape(-1, 3).astype(np.int64)
    sb, sg, sr = (int(s) for s in px.sum(axis=0))
    n = width * height
    # top_down only flips row order, which is irrelevant to channel sums
    del top_down
    return width, height, sr / n, sg / n, sb / n


def _decode_ppm(raw: bytes) -> tuple[int, int, float, float, float]:
    # header: "P6" <ws> width <ws> height <ws> maxval <single ws> pixels;
    # '#' comments allowed between tokens
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if pos < len(raw) and raw[pos : pos + 1] == b"#":
            while pos < len(raw) and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(raw[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if width <= 0 or height <= 0 or maxval != 255:
        raise ValueError("only maxval-255 P6 PPM supported")
    n = width * height
    if pos + 3 * n > len(raw):
        raise ValueError("truncated PPM pixel data")
    import numpy as np

    px = np.frombuffer(raw, np.uint8, 3 * n, pos).reshape(-1, 3).astype(np.int64)
    sr, sg, sb = (int(s) for s in px.sum(axis=0))
    return width, height, sr / n, sg / n, sb / n


def synth_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic solid-color test images keyed by id: even ids encode as
    BMP, odd as PPM; size and color are closed-form functions of the id so a
    SQL oracle can predict what the decoder must recover. Runs in
    mapInPandas — the same Arrow batch path real media ingestion uses."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 4 + d % 13, 4 + d % 11
                color = (d * 37 % 256, d * 59 % 256, d * 83 % 256)
                rows = [[color] * w for _ in range(h)]
                enc = encode_bmp if d % 2 == 0 else encode_ppm
                payloads.append(enc(w, h, rows))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(F.col(id_col).alias(id_col)).mapInPandas(
        _batches, "doc_id bigint, payload binary"
    )


def extract_image_features(media: DataFrame) -> DataFrame:
    """REAL decode over binary payloads: parse BMP/PPM headers and pixels in
    Arrow-batched mapInPandas, emit fixed-width features (format, dims,
    exact per-channel means). Undecodable payloads get fmt='error' with null
    features rather than failing the batch — at 100 TB some blobs are
    always corrupt."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "fmt", "width", "height", "mean_r", "mean_g", "mean_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    fmt, w, h, mr, mg, mb = decode_image(payload)
                except ValueError:
                    fmt, w, h, mr, mg, mb = "error", None, None, None, None, None
                out["doc_id"].append(doc_id)
                out["fmt"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r"].append(mr)
                out["mean_g"].append(mg)
                out["mean_b"].append(mb)
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(_batches, IMAGE_FEATURE_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Features are deterministic stand-ins (byte length, header hex, fake
    dimensions from header bytes) so tests — and the DuckDB oracle — can
    verify the batch plumbing end-to-end without real codecs.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "header_hex": payloads.map(lambda b: bytes(b)[:8].hex().upper()),
                    "fake_width": payloads.map(lambda b: 64 + bytes(b)[0] % 192).astype("int32"),
                    "fake_height": payloads.map(lambda b: 64 + bytes(b)[-1] % 192).astype("int32"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(_batches, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Real pure-Python audio codec: 16-bit PCM RIFF/WAVE (the raw interchange
# format — no compression, no external libs). Completes the multimodal triad:
# image decode (BMP/PPM above), audio decode (here), video frame sampling
# (sample_frames below). The decoder walks the RIFF chunk list properly, so
# files with extra chunks (LIST/INFO, fact) parse; stats are exact integer
# sums, deterministic regardless of batch/partition order.
# ---------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = (
    "doc_id bigint, fmt string, sample_rate int, n_channels int, "
    "n_frames int, peak int, rms double"
)


def encode_wav(sample_rate: int, n_channels: int, frames: list[list[int]]) -> bytes:
    """Canonical 16-bit PCM WAV: frames[i] = one int16 sample per channel."""
    body = bytearray()
    for frame in frames:
        for s in frame:
            body += struct.pack("<h", s)
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + bytes(body)
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(payload: bytes) -> tuple[int, int, int, int, float]:
    """Decode 16-bit PCM WAV: walk the RIFF chunk list (tolerating extra
    chunks and odd-length chunk padding), parse fmt, and compute exact
    stats over the sample data.

    Returns (sample_rate, n_channels, n_frames, peak, rms) where peak is
    max |sample| across all channels and rms = sqrt(sum(s²)/n) from exact
    integer sums. Raises ValueError on non-PCM / non-16-bit / malformed
    input so callers can tag instead of crash.
    """
    raw = bytes(payload)
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_chunk, data = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (size,) = struct.unpack_from("<I", raw, pos + 4)
        body_at = pos + 8
        if body_at + size > len(raw):
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt_chunk = struct.unpack_from("<HHIIHH", raw, body_at)
        elif cid == b"data":
            data = raw[body_at : body_at + size]
        pos = body_at + size + (size & 1)  # chunks pad to even offsets
    if fmt_chunk is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _rate, block_align, bits = fmt_chunk
    if audio_format != 1 or bits != 16 or n_channels < 1:
        raise ValueError("only 16-bit PCM supported")
    if block_align != n_channels * 2 or len(data) % block_align != 0:
        raise ValueError("inconsistent PCM framing")
    import numpy as np

    samples = np.frombuffer(data, "<i2").astype(np.int64)
    n_frames = len(samples) // n_channels
    if n_frames == 0:
        return sample_rate, n_channels, 0, 0, 0.0
    peak = int(np.abs(samples).max())
    sum_sq = int((samples * samples).sum())  # exact: |s|<2^15, n<2^33
    rms = (sum_sq / len(samples)) ** 0.5
    return sample_rate, n_channels, n_frames, peak, rms


def synth_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic square-wave WAV per id: amplitude A = id·13 % 30000,
    frames = 16 + id % 50, channels = 1 + id % 2, 8 kHz. A square wave's
    peak AND rms both equal A exactly, so a SQL oracle predicts the decoded
    stats in closed form — any framing/interleave/sign bug breaks the hash."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                amp, n, ch = d * 13 % 30000, 16 + d % 50, 1 + d % 2
                frames = [[amp if i % 2 == 0 else -amp] * ch for i in range(n)]
                payloads.append(encode_wav(8000, ch, frames))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(F.col(id_col).alias(id_col)).mapInPandas(
        _batches, "doc_id bigint, payload binary"
    )


def extract_audio_features(media: DataFrame) -> DataFrame:
    """REAL audio decode over binary payloads (RIFF walk + PCM stats) in
    Arrow-batched mapInPandas; undecodable payloads tagged fmt='error'."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols = ("doc_id", "fmt", "sample_rate", "n_channels", "n_frames", "peak", "rms")
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    sr, ch, n, peak, rms = decode_wav(payload)
                    row = (doc_id, "wav", sr, ch, n, peak, rms)
                except ValueError:
                    row = (doc_id, "error", None, None, None, None, None)
                for k, v in zip(cols, row):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(_batches, AUDIO_FEATURE_SCHEMA)


def sample_frames(media: DataFrame, *, n_frames: int = 4) -> DataFrame:
    """Frame-sampling shape for video payloads: each payload explodes into
    `n_frames` evenly spaced 'frames' (here: byte-slice checksums). The
    output cardinality and schema match a real frame sampler."""
    import hashlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_ck = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                step = max(len(raw) // n_frames, 1)
                for i in range(n_frames):
                    chunk = raw[i * step : (i + 1) * step]
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_ck.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_index": out_idx, "frame_checksum": out_ck}
            )

    return media.select("doc_id", "payload").mapInPandas(_batches, FRAME_SCHEMA)
