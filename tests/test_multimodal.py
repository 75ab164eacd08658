"""Multimodal plumbing tests: binary schema, Arrow batch path, frame
sampling cardinality, real BMP/PPM decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.operators.multimodal import (
    attach_payload,
    decode_image,
    encode_bmp,
    encode_ppm,
    extract_features,
    extract_image_features,
    sample_frames,
    synth_images,
)
from weather_data_warehouse_aws_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_smoke_dir):
    docs = load_table(spark, sf_smoke_dir, "documents")
    return attach_payload(docs, "doc_id", "text").cache()


def test_payload_schema_and_sizes(media):
    assert dict(media.dtypes) == {
        "doc_id": "bigint",
        "payload": "binary",
        "mime": "string",
        "n_bytes": "int",
    }
    bad = media.filter(F.octet_length("payload") != F.col("n_bytes"))
    assert bad.count() == 0


def test_extract_features_roundtrip(media, spark):
    feats = extract_features(media)
    n = media.count()
    rows = feats.collect()
    assert len(rows) == n
    assert all(64 <= r.fake_width < 256 and 64 <= r.fake_height < 256 for r in rows)
    assert all(len(r.header_hex) == 16 for r in rows)
    want = {r.doc_id: r.n_bytes for r in media.select("doc_id", "n_bytes").collect()}
    assert {r.doc_id: r.n_bytes for r in rows} == want


def test_sample_frames_cardinality(media):
    frames = sample_frames(media, n_frames=4)
    assert frames.count() == media.count() * 4
    per_doc = frames.groupBy("doc_id").agg(
        F.countDistinct("frame_index").alias("k"),
        F.countDistinct("frame_checksum").alias("d"),
    )
    assert per_doc.filter(F.col("k") != 4).count() == 0


# ---------------------------------------------------------------------------
# real codec: gradient images catch pixel-order / padding / channel bugs
# ---------------------------------------------------------------------------

def _gradient(w, h):
    return [
        [((x * 3 + y * 7) % 256, (x * 5 + y) % 256, (x + y * 11) % 256) for x in range(w)]
        for y in range(h)
    ]


@pytest.mark.parametrize("w,h", [(7, 5), (8, 3), (1, 1), (13, 14)])
@pytest.mark.parametrize("enc,fmt", [(encode_bmp, "bmp"), (encode_ppm, "ppm")])
def test_decode_gradient_roundtrip(w, h, enc, fmt):
    rows = _gradient(w, h)
    n = w * h
    expected = tuple(
        sum(rows[y][x][c] for y in range(h) for x in range(w)) / n for c in range(3)
    )
    got_fmt, gw, gh, mr, mg, mb = decode_image(enc(w, h, rows))
    assert (got_fmt, gw, gh) == (fmt, w, h)
    # integer-sum / count is exact — no float tolerance needed
    assert (mr, mg, mb) == expected


def test_decode_bmp_top_down():
    # negative height = top-down row order; channel means must not change
    w, h = 6, 4
    rows = _gradient(w, h)
    raw = bytearray(encode_bmp(w, h, rows))
    import struct

    struct.pack_into("<i", raw, 22, -h)  # flip height sign in the info header
    # re-order pixel rows top-down to keep the image equivalent
    stride = w * 3 + ((-w * 3) % 4)
    off = 54
    body = raw[off:]
    flipped = bytearray()
    for i in reversed(range(h)):
        flipped += body[i * stride : (i + 1) * stride]
    raw[off:] = flipped
    a = decode_image(bytes(raw))
    b = decode_image(encode_bmp(w, h, rows))
    assert a == b


def test_decode_ppm_with_comment():
    w, h = 3, 2
    rows = _gradient(w, h)
    payload = encode_ppm(w, h, rows)
    commented = payload.replace(b"P6\n", b"P6\n# made by a test\n", 1)
    assert decode_image(commented) == decode_image(payload)


@pytest.mark.parametrize(
    "payload",
    [
        b"\x89PNG\r\n\x1a\n....",  # wrong magic
        b"BM" + b"\x00" * 20,  # truncated BMP header
        b"P6\n4 4\n255\n" + b"\x00" * 5,  # truncated PPM pixels
        b"P6\n4 4\n65535\n" + b"\x00" * 96,  # unsupported maxval
    ],
)
def test_decode_rejects_bad_payloads(payload):
    with pytest.raises(ValueError):
        decode_image(payload)


def test_extract_image_features_spark_path(spark, sf_smoke_dir):
    docs = load_table(spark, sf_smoke_dir, "documents").limit(40)
    feats = extract_image_features(synth_images(docs)).collect()
    assert len(feats) == 40
    for r in feats:
        d = r.doc_id
        assert r.fmt == ("bmp" if d % 2 == 0 else "ppm")
        assert (r.width, r.height) == (4 + d % 13, 4 + d % 11)
        assert (r.mean_r, r.mean_g, r.mean_b) == (
            float(d * 37 % 256),
            float(d * 59 % 256),
            float(d * 83 % 256),
        )


def test_extract_image_features_tags_errors(spark):
    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(2, 2, _gradient(2, 2)))), (2, bytearray(b"garbage"))],
        "doc_id bigint, payload binary",
    )
    rows = {r.doc_id: r for r in extract_image_features(df).collect()}
    assert rows[1].fmt == "ppm"
    assert rows[2].fmt == "error" and rows[2].width is None


# ---------------------------------------------------------------------------
# WAV (16-bit PCM) codec
# ---------------------------------------------------------------------------
def test_wav_roundtrip_mono_and_stereo():
    from weather_data_warehouse_aws_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    mono = encode_wav(8000, 1, [[100], [-200], [300], [-32768]])
    sr, ch, n, peak, rms = decode_wav(mono)
    assert (sr, ch, n, peak) == (8000, 1, 4, 32768)
    exp = ((100**2 + 200**2 + 300**2 + 32768**2) / 4) ** 0.5
    assert rms == exp

    stereo = encode_wav(44100, 2, [[1000, -1000], [500, -500]])
    sr, ch, n, peak, rms = decode_wav(stereo)
    assert (sr, ch, n, peak) == (44100, 2, 2, 1000)
    assert rms == ((2 * 1000**2 + 2 * 500**2) / 4) ** 0.5


def test_wav_extra_chunks_and_padding():
    """RIFF chunk walk tolerates chunks before data and odd-size padding."""
    import struct

    from weather_data_warehouse_aws_spark.operators.multimodal import decode_wav

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    junk = b"abc"  # odd length -> pad byte
    data = struct.pack("<hh", 7, -7)
    chunks = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", len(junk)) + junk + b"\x00"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    raw = b"RIFF" + struct.pack("<I", len(chunks)) + chunks
    assert decode_wav(raw) == (8000, 1, 2, 7, 7.0)


def test_wav_rejects_malformed():
    import struct

    import pytest as _pytest

    from weather_data_warehouse_aws_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    with _pytest.raises(ValueError):
        decode_wav(b"not audio at all")
    good = encode_wav(8000, 1, [[1], [2]])
    with _pytest.raises(ValueError):
        decode_wav(good[:20])  # truncated chunk
    # 8-bit PCM claimed: fmt says bits=8
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    raw = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with _pytest.raises(ValueError):
        decode_wav(raw)


def test_synth_audio_decode_matches_closed_form(spark, sf_smoke_dir):
    """The Spark-side path: synthesize square-wave WAVs, REALLY decode, and
    check the closed-form predictions the oracle relies on."""
    from weather_data_warehouse_aws_spark.operators.multimodal import (
        extract_audio_features,
        synth_audio,
    )

    docs = load_table(spark, sf_smoke_dir, "documents").limit(64)
    feats = extract_audio_features(synth_audio(docs)).collect()
    assert len(feats) == 64
    for r in feats:
        d = r.doc_id
        assert r.fmt == "wav"
        assert r.sample_rate == 8000
        assert r.n_channels == 1 + d % 2
        assert r.n_frames == 16 + d % 50
        amp = d * 13 % 30000
        assert r.peak == amp
        assert r.rms == float(amp)


def test_corrupt_audio_tagged_not_fatal(spark):
    from weather_data_warehouse_aws_spark.operators.multimodal import (
        extract_audio_features,
    )

    media = spark.createDataFrame(
        [(1, bytearray(b"RIFFgarbage")), (2, bytearray(b""))],
        "doc_id bigint, payload binary",
    )
    rows = {r.doc_id: r for r in extract_audio_features(media).collect()}
    assert rows[1].fmt == "error" and rows[1].peak is None
    assert rows[2].fmt == "error"
