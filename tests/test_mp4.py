"""ISO-BMFF container layer (dataops/mp4.py) + the real MP4 frame-sampling
path in multimodal.sample_frames / extract_media_features.

The muxer and parser are pinned against each other (independently
constructed bitstream vs top-down box walk); byte-exact sample extraction
means a wrong stco/stsz/stsc interpretation cannot pass.
"""

import numpy as np
import pytest

from open_ocr_spark.dataops.mp4 import mux_mp4, parse_mp4


def test_mux_parse_roundtrip():
    samples = [b"frameA", b"frameBB", b"frameCCC", b"D"]
    mp4 = mux_mp4(samples, 320, 240, timescale=600, sample_delta=600)
    info = parse_mp4(mp4)
    assert (info["width"], info["height"]) == (320, 240)
    assert info["n_samples"] == 4
    assert info["duration_s"] == 4.0
    for (off, sz, ts), want, k in zip(info["samples"], samples, range(4)):
        assert mp4[off : off + sz] == want
        assert ts == float(k)


def test_parse_fractional_timescale():
    mp4 = mux_mp4([b"x", b"y", b"z"], 64, 64, timescale=30000,
                  sample_delta=1001)  # 29.97 fps style
    info = parse_mp4(mp4)
    assert info["n_samples"] == 3
    assert abs(info["samples"][1][2] - 1001 / 30000) < 1e-12
    assert abs(info["duration_s"] - 3 * 1001 / 30000) < 1e-12


def test_parse_rejects_non_mp4_and_corrupt():
    assert parse_mp4(b"\x89PNG\r\n\x1a\n1234") is None
    assert parse_mp4(b"0123456789ab") is None
    mp4 = mux_mp4([b"frame"], 16, 16)
    with pytest.raises(ValueError):
        parse_mp4(mp4[:-6])  # truncated moov
    # bytes deleted mid-file: some box's recorded size now overruns EOF
    broken = bytearray(mp4)
    del broken[mp4.find(b"mdat") + 4 : mp4.find(b"mdat") + 9]
    with pytest.raises(ValueError):
        parse_mp4(bytes(broken))


def test_sniff_and_features_mp4(spark):
    from open_ocr_spark.dataops.multimodal import (
        extract_media_features,
        sniff_media_type,
    )

    mp4 = mux_mp4([b"f0", b"f1", b"f2"], 128, 96, timescale=10,
                  sample_delta=5)
    assert sniff_media_type(mp4) == "video/mp4"
    df = spark.createDataFrame(
        [(1, bytearray(mp4), None)],
        "media_id long, payload binary, media_type string",
    )
    row = extract_media_features(df, strict=True).collect()[0]
    assert row["media_type"] == "video/mp4"
    assert (row["width"], row["height"]) == (128, 96)
    assert row["n_frames"] == 3
    assert row["duration_s"] == 1.5


def test_sample_frames_real_mp4(spark):
    """3 samples of 1 s each, fps=2 -> 6 ticks; tick k/2 must carry the
    BYTE-EXACT codec sample whose dts covers it (floor), with ts = tick."""
    from open_ocr_spark.dataops.multimodal import sample_frames

    payload = mux_mp4([b"AAAA", b"BB", b"CCCCCC"], 32, 32,
                      timescale=600, sample_delta=600)
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "media_id long, payload binary"
    )
    rows = sorted(
        sample_frames(df, fps=2.0, strict=True).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [bytes(r["frame"]) for r in rows] == [
        b"AAAA", b"AAAA", b"BB", b"BB", b"CCCCCC", b"CCCCCC"
    ]
    assert [r["ts_s"] for r in rows] == [0.0, 0.5, 1.0, 1.5, 2.0, 2.5]
    # fps=1 -> one tick per sample
    rows = sample_frames(df, fps=1.0, strict=True).collect()
    assert len(rows) == 3


def test_sample_frames_strict_still_raises_for_non_mp4(spark):
    from open_ocr_spark.dataops.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, bytearray(b"\x1a\x45\xdf\xa3webm-ish"))],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="ffmpeg"):
        sample_frames(df, strict=True).collect()
    # default mode: deterministic stub fan-out still works
    assert len(sample_frames(df, strict=False).collect()) >= 1


def test_corrupt_tables_normalize_to_valueerror():
    """struct.error from short sample-table buffers must surface as
    ValueError — the one exception non-strict kernels route to
    error-as-value (a crawl payload must never kill the job with an
    unexpected type)."""
    mp4 = mux_mp4([b"abc", b"de"], 8, 8)
    broken = bytearray(mp4)
    i = mp4.find(b"stsz")
    broken[i + 12 : i + 16] = (999_999).to_bytes(4, "big")
    with pytest.raises(ValueError, match="truncated table"):
        parse_mp4(bytes(broken))
