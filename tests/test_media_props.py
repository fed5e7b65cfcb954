"""Property tests for the pure-stdlib media codecs (PNG/JPEG/WAV/MP4).

The lossless codecs (PNG, WAV PCM, MP4 sample extraction) must round-trip
EXACTLY for arbitrary inputs; baseline JPEG with all-ones quant tables
must stay within the analytically-derived rounding envelope. Hypothesis
drives shapes/values so the fixed unit fixtures can't mask
dimension-parity or sign bugs (odd widths, 1-pixel images, extreme
sample values).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def rgb_arrays(draw, max_side=24):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8
    )


@settings(max_examples=25, deadline=None)
@given(rgb_arrays())
def test_png_roundtrip_exact(arr):
    from open_ocr_spark.dataops.multimodal import decode_pixels, encode_png

    assert np.array_equal(decode_pixels(encode_png(arr)), arr)


@settings(max_examples=15, deadline=None)
@given(rgb_arrays(max_side=20))
def test_jpeg_roundtrip_bounded(arr):
    from open_ocr_spark.dataops.jpeg import decode_jpeg, encode_jpeg

    out = decode_jpeg(encode_jpeg(arr))
    assert out.shape == arr.shape
    # all-ones quant: per-coefficient rounding <= 0.5, worst-case pixel
    # drift after IDCT + two colorspace roundings stays in single digits
    assert int(np.abs(out.astype(int) - arr.astype(int)).max()) <= 6


@settings(max_examples=15, deadline=None)
@given(rgb_arrays(max_side=16))
def test_jpeg_gray_roundtrip_exact(arr):
    """Grayscale flat-block images are EXACT through the codec: force the
    array gray and block-flat, the strongest invariant we can state."""
    from open_ocr_spark.dataops.jpeg import decode_jpeg, encode_jpeg

    g = arr[0, 0, 0]
    flat = np.full(arr.shape, g, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat)), flat)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(flat, grayscale=True)), flat
    )


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=200),
    st.integers(1, 4),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_exact(values, channels, rate):
    from open_ocr_spark.dataops.multimodal import decode_wav, encode_wav

    frames = len(values) // channels
    if frames == 0:
        return
    arr = np.array(values[: frames * channels], dtype=np.int16).reshape(
        frames, channels
    )
    out, got_rate = decode_wav(encode_wav(arr, rate))
    assert got_rate == rate
    assert np.array_equal(out, arr.astype(np.int32))


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.binary(min_size=1, max_size=64), min_size=1, max_size=20),
    st.integers(1, 1000),
    st.integers(1, 90000),
)
def test_mp4_sample_extraction_exact(samples, delta, timescale):
    from open_ocr_spark.dataops.mp4 import mux_mp4, parse_mp4

    mp4 = mux_mp4(samples, 64, 48, timescale=timescale, sample_delta=delta)
    info = parse_mp4(mp4)
    assert info["n_samples"] == len(samples)
    for k, ((off, sz, ts), want) in enumerate(
        zip(info["samples"], samples)
    ):
        assert mp4[off : off + sz] == want
        assert abs(ts - k * delta / timescale) < 1e-12
