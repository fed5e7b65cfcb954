"""JPEG arithmetic entropy coding (QM coder): raw-coder roundtrips,
decode(arith(x)) == decode(huffman(x)) pinning, corruption totality, and
structural edges."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_ocr_spark.dataops.jpeg import decode_jpeg, encode_jpeg
from open_ocr_spark.dataops.jpeg_arith import (
    _FIXED_STATE,
    QMDecoder,
    QMEncoder,
    encode_jpeg_arith,
)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(0, 1), min_size=1, max_size=2000),
    st.integers(1, 24),
    st.randoms(use_true_random=False),
)
def test_qm_coder_roundtrip(bits, nctx, rng):
    ctxs = [rng.randrange(nctx) for _ in bits]
    enc_stats, enc = bytearray(nctx), QMEncoder()
    for b, cx in zip(bits, ctxs):
        enc.code(b, enc_stats, cx)
    payload = enc.finish()
    dec_stats = bytearray(nctx)
    dec = QMDecoder(payload + b"\xff\xd9", 0)
    assert [dec.decode(dec_stats, cx) for cx in ctxs] == bits


def test_qm_adaptation_compresses_skewed_streams():
    def size(bits):
        stats, e = bytearray(1), QMEncoder()
        for b in bits:
            e.code(b, stats, 0)
        return len(e.finish())

    assert size([0] * 4000) < 8  # constant stream: a few bytes
    rng = np.random.default_rng(5)
    skewed = list((rng.random(4000) < 0.01).astype(int))
    assert size(skewed) < 80  # entropy is ~40 bytes
    fair = list(rng.integers(0, 2, 4000))
    assert 480 <= size(fair) <= 560  # ~4% QM overhead over 500


def test_qm_fixed_state_never_adapts():
    stats = bytearray([_FIXED_STATE])
    e = QMEncoder()
    for b in (1, 0, 1, 1, 0, 0, 1):
        e.code(b, stats, 0)
        assert stats[0] == _FIXED_STATE


@settings(max_examples=15, deadline=None)
@given(
    st.integers(6, 28),
    st.integers(6, 28),
    st.sampled_from([(True, False), (False, False), (False, True)]),
    st.integers(0, 2**32 - 1),
)
def test_arith_matches_huffman_pixels(h, w, mode, seed):
    gray, sub = mode
    arr = np.random.default_rng(seed).integers(0, 256, (h, w, 3),
                                               dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(arr, grayscale=gray, subsample=sub))
    got = decode_jpeg(encode_jpeg_arith(arr, grayscale=gray, subsample=sub))
    assert got is not None and np.array_equal(base, got)


def test_arith_stream_is_smaller_on_noise():
    arr = np.random.default_rng(0).integers(0, 256, (32, 32, 3),
                                            dtype=np.uint8)
    assert len(encode_jpeg_arith(arr)) < len(encode_jpeg(arr))


def test_flat_block_roundtrips_exactly():
    arr = np.full((8, 8, 3), 137, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_arith(arr, grayscale=True))
    assert np.array_equal(out, np.full((8, 8, 3), 137))


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**32 - 1), st.data())
def test_corruption_totality(seed, data):
    """Any single-byte corruption / truncation of an arithmetic stream
    either decodes, returns None, or raises ValueError — never any
    other exception (the error-as-value contract)."""
    arr = np.random.default_rng(seed).integers(0, 256, (10, 10, 3),
                                               dtype=np.uint8)
    enc = bytearray(encode_jpeg_arith(arr))
    if data.draw(st.booleans()):
        enc = enc[: data.draw(st.integers(2, len(enc)))]
    else:
        i = data.draw(st.integers(2, len(enc) - 1))
        enc[i] ^= data.draw(st.integers(1, 255))
    try:
        decode_jpeg(bytes(enc))
    except ValueError:
        pass


def test_restart_in_arithmetic_scan_raises():
    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    enc = bytearray(encode_jpeg_arith(arr, grayscale=True))
    sos = enc.find(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04\x00\x02"
    patched = bytes(enc[:sos]) + dri + bytes(enc[sos:])
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(patched)


def test_hostile_arith_dimensions_rejected():
    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    enc = bytearray(encode_jpeg_arith(arr, grayscale=True))
    sof = enc.find(b"\xff\xc9")
    enc[sof + 5 : sof + 7] = (65500).to_bytes(2, "big")  # height
    enc[sof + 7 : sof + 9] = (65500).to_bytes(2, "big")  # width
    with pytest.raises(ValueError, match="too large"):
        decode_jpeg(bytes(enc))
