"""JPEG arithmetic entropy coding (ITU-T T.81 Annexes D & F): QM-coder
decoder + encoder twin for sequential DCT frames (SOF9).

Completes the JPEG surface next to dataops/jpeg.py's Huffman paths: the
DCT/quant/upsample machinery is shared (jpeg.py `_plane_blocks` /
`_reconstruct`); only the entropy layer differs.  The decoder handles
8-bit sequential arithmetic frames with 1 or 3 components in one
interleaved scan — the same scope as the baseline Huffman decoder; the
encoder exists (like the progressive encoder) so fixtures and property
tests can synthesize REAL arithmetic streams without an image library,
pinned by decode(arith(x)) == decode(huffman(x)).

Implementation notes:
- The probability estimation table is transcribed from T.81 Table D.3
  (113 adaptive states + the non-adapting state the sign decisions
  use).  Encoder and decoder share it, so stream round-trips validate
  the full state machine; a transcription slip could affect only
  interop with third-party arithmetic codecs (none exist in this
  container — PIL does not decode arithmetic JPEG either).
- Interval convention (T.81 D.1): the MPS takes the bottom subinterval
  of size A - Qe and the LPS the top Qe, with conditional exchange when
  A - Qe < Qe; MPS state transitions happen only on renormalization.
- The encoder keeps the code register C as an arbitrary-precision int
  (Python) instead of running BYTEOUT/stack-of-0xFF carry propagation:
  every renormalization shifts C left, carries propagate inside big-int
  addition, and the final byte string is C resolved to the fewest-bits
  value in [C, C+A), byte-stuffed (0x00 after every 0xFF) exactly as
  T.81 §B.1.1.5 requires.  Equivalent to the flowchart coder, minus the
  register-width bookkeeping.
- Statistics layout follows T.81 Tables F.4/F.5: per-table DC areas
  (conditioning contexts 0/4/8/12/16 from the previous diff vs the
  L/U bounds, X1 chain at 20, mantissa +14) and AC areas (3 bins per
  coefficient index, X chains at 189/217 split by Kx, mantissa +14).
  Default conditioning L=0, U=1, Kx=5; a DAC segment overrides.

Restart markers inside arithmetic scans are out of scope (the encoder
never emits DRI; the decoder raises) — rare in the wild and orthogonal
to the entropy coding itself.
"""

from __future__ import annotations

import struct

# T.81 Table D.3: (Qe, NLPS, NMPS, SWITCH) — the column order of the
# standard's table; index 113 is the
# non-adapting state used for AC sign decisions (F.1.4.4.1.2 note).
_QE = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
    (0x5A1D, 113, 113, 0),  # 113: fixed (non-adapting) equistate
)

_FIXED_STATE = 113


class QMEncoder:
    """T.81 Annex D encoder with an arbitrary-precision code register
    (see module docstring); emits the byte-stuffed entropy segment."""

    __slots__ = ("a", "c", "shifts")

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.shifts = 0

    def code(self, bit: int, stats: bytearray, idx: int) -> None:
        state = stats[idx]
        i = state & 0x7F
        mps = state >> 7
        qe, nlps, nmps, switch = _QE[i]
        a1 = self.a - qe
        if bit == mps:
            if a1 & 0x8000:
                self.a = a1
                return  # no renorm: no state transition (D.1.5)
            if a1 < qe:  # conditional exchange: MPS takes the top Qe
                self.c += a1
                self.a = qe
            else:
                self.a = a1
            stats[idx] = (mps << 7) | nmps
        else:
            if a1 < qe:  # conditional exchange: LPS takes the bottom
                self.a = a1
            else:
                self.c += a1
                self.a = qe
            if switch:
                mps ^= 1
            stats[idx] = (mps << 7) | nlps
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.shifts += 1

    def finish(self) -> bytes:
        """Resolve the final interval [C, C+A) to the fewest-significant-
        bits code value, byte-align, trim trailing zero bytes, stuff."""
        total_bits = 16 + self.shifts
        lo, hi = self.c, self.c + self.a - 1
        # largest k such that clearing hi's low k bits stays >= lo
        k = 0
        while k < total_bits and (hi >> (k + 1)) << (k + 1) >= lo:
            k += 1
        code = (hi >> k) << k
        nbytes = -(-total_bits // 8)
        code <<= nbytes * 8 - total_bits
        raw = code.to_bytes(nbytes, "big")
        raw = raw.rstrip(b"\x00") or b"\x00"
        out = bytearray()
        for b in raw:
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


class QMDecoder:
    """T.81 Annex D decoder over a byte-stuffed entropy segment; feeds
    zero bits past the terminating marker (jdarith-compatible)."""

    __slots__ = ("data", "pos", "end", "a", "v", "bitbuf", "nbits", "ended")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.end = len(data)
        self.bitbuf = 0
        self.nbits = 0
        self.ended = False
        self.a = 0x10000
        self.v = 0
        for _ in range(16):
            self.v = (self.v << 1) | self._bit()

    def _next_byte(self) -> int:
        if self.ended or self.pos >= self.end:
            self.ended = True
            return 0
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < self.end else 0xD9
            if nxt != 0x00:
                self.ended = True  # marker: feed zeros, leave pos on it
                return 0
            self.pos += 2  # stuffed 0xFF
            return 0xFF
        self.pos += 1
        return b

    def _bit(self) -> int:
        if self.nbits == 0:
            self.bitbuf = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def decode(self, stats: bytearray, idx: int) -> int:
        state = stats[idx]
        i = state & 0x7F
        mps = state >> 7
        qe, nlps, nmps, switch = _QE[i]
        a1 = self.a - qe
        if self.v < a1:
            if a1 & 0x8000:
                self.a = a1
                return mps
            # bottom subinterval with renorm pending
            if a1 < qe:
                bit = mps ^ 1  # conditional exchange: bottom is LPS
                if switch:
                    mps ^= 1
                stats[idx] = (mps << 7) | nlps
            else:
                bit = mps
                stats[idx] = (mps << 7) | nmps
            self.a = a1
        else:
            self.v -= a1
            self.a = qe
            if a1 < qe:  # conditional exchange: top is MPS
                bit = mps
                stats[idx] = (mps << 7) | nmps
            else:
                bit = mps ^ 1
                if switch:
                    mps ^= 1
                stats[idx] = (mps << 7) | nlps
        while self.a < 0x8000:
            self.a <<= 1
            self.v = (self.v << 1) | self._bit()
        return bit


# --- DC / AC block coding (T.81 F.1.4, stats layout Tables F.4/F.5) ----------

def _encode_dc(enc, st, ctx: int, diff: int, low: int, up: int) -> int:
    """Code one DC difference; returns the next conditioning context."""
    if diff == 0:
        enc.code(0, st, ctx)
        return 0
    enc.code(1, st, ctx)
    sign = 1 if diff < 0 else 0
    enc.code(sign, st, ctx + 1)
    sz = (-diff if sign else diff) - 1
    base = ctx + 2 + sign
    if sz == 0:
        enc.code(0, st, base)
        m, mant = 0, base + 14
    else:
        enc.code(1, st, base)
        m, pos = 1, 20
        while sz >= (m << 1):
            enc.code(1, st, pos)
            m <<= 1
            pos += 1
        enc.code(0, st, pos)
        mant = pos + 14
    mm = m
    while mm >> 1:
        mm >>= 1
        enc.code(1 if sz & mm else 0, st, mant)
    if m < (1 << low) >> 1:
        return 0
    if m > (1 << up) >> 1:
        return 12 + 4 * sign
    return 4 + 4 * sign


def _decode_dc(dec, st, ctx: int, low: int, up: int):
    """(diff, next conditioning context) for one DC decision tree."""
    if dec.decode(st, ctx) == 0:
        return 0, 0
    sign = dec.decode(st, ctx + 1)
    base = ctx + 2 + sign
    m = dec.decode(st, base)
    mant = base + 14
    if m:
        pos = 20
        while dec.decode(st, pos):
            m <<= 1
            if m == 0x8000:
                raise ValueError("jpeg: arith DC magnitude overflow")
            pos += 1
        mant = pos + 14
    if m < (1 << low) >> 1:
        nctx = 0
    elif m > (1 << up) >> 1:
        nctx = 12 + 4 * sign
    else:
        nctx = 4 + 4 * sign
    v, mm = m, m
    while mm >> 1:
        mm >>= 1
        if dec.decode(st, mant):
            v |= mm
    v += 1
    return (-v if sign else v), nctx


def _encode_ac(enc, st, fixed, zz, kx: int) -> None:
    """Code one block's AC coefficients (zigzag order, indices 1..63)."""
    ke = 0
    for k in range(63, 0, -1):
        if zz[k]:
            ke = k
            break
    k = 1
    while k <= ke:
        base = 3 * (k - 1)
        enc.code(0, st, base)  # not EOB
        while not zz[k]:
            enc.code(0, st, base + 1)
            k += 1
            base += 3
        enc.code(1, st, base + 1)
        v = int(zz[k])
        sign = 1 if v < 0 else 0
        enc.code(sign, fixed, 0)
        sz = (-v if sign else v) - 1
        pos = base + 2
        if sz == 0:
            enc.code(0, st, pos)
            m = 0
        else:
            enc.code(1, st, pos)
            if sz == 1:
                enc.code(0, st, pos)
                m = 1
            else:
                enc.code(1, st, pos)
                m, pos = 2, (189 if k <= kx else 217)
                while sz >= (m << 1):
                    enc.code(1, st, pos)
                    m <<= 1
                    pos += 1
                enc.code(0, st, pos)
        mant = pos + 14
        mm = m
        while mm >> 1:
            mm >>= 1
            enc.code(1 if sz & mm else 0, st, mant)
        k += 1
    if ke < 63:
        enc.code(1, st, 3 * (k - 1))  # EOB


def _decode_ac(dec, st, fixed, blk, kx: int) -> None:
    """Decode one block's AC coefficients into blk[1..63]."""
    k = 1
    while k <= 63:
        base = 3 * (k - 1)
        if dec.decode(st, base):
            break  # EOB
        while dec.decode(st, base + 1) == 0:
            k += 1
            base += 3
            if k > 63:
                raise ValueError("jpeg: arith AC run overflow")
        sign = dec.decode(fixed, 0)
        pos = base + 2
        m = dec.decode(st, pos)
        if m:
            if dec.decode(st, pos):
                m, pos = 2, (189 if k <= kx else 217)
                while dec.decode(st, pos):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "jpeg: arith AC magnitude overflow"
                        )
                    pos += 1
        v, mm, mant = m, m, pos + 14
        while mm >> 1:
            mm >>= 1
            if dec.decode(st, mant):
                v |= mm
        v += 1
        blk[k] = -v if sign else v
        k += 1


# --- full-stream encoder / scan decoder --------------------------------------

_DC_BINS = 64
_AC_BINS = 256


def decode_scan(data: bytes, pos: int, order, mcux: int, mcuy: int, dac):
    """Fill each order entry's coefficient array from the arithmetic
    entropy segment starting at `pos`.  `order` rows are
    (coefs, bw, ch, cv, td, ta); `dac` maps (class, id) -> conditioning
    byte ((U<<4)|L for DC, Kx for AC; T.81 B.2.4.3 defaults apply)."""
    dec = QMDecoder(bytes(data), pos)
    dc_stats: dict[int, bytearray] = {}
    ac_stats: dict[int, bytearray] = {}
    fixed = bytearray([_FIXED_STATE])
    dc_ctx = [0] * len(order)
    preds = [0] * len(order)
    for _coefs, _bw, _ch, _cv, td, ta in order:
        dc_stats.setdefault(td, bytearray(_DC_BINS))
        ac_stats.setdefault(ta, bytearray(_AC_BINS))
    for idx in range(mcuy * mcux):
        my, mx = divmod(idx, mcux)
        for ci, (coefs, bw, ch, cv, td, ta) in enumerate(order):
            cond_dc = dac.get((0, td), 0x10)
            low, up = cond_dc & 15, cond_dc >> 4
            kx = dac.get((1, ta), 5)
            for by in range(cv):
                for bx in range(ch):
                    blk = coefs[(my * cv + by) * bw + mx * ch + bx]
                    diff, dc_ctx[ci] = _decode_dc(
                        dec, dc_stats[td], dc_ctx[ci], low, up
                    )
                    preds[ci] += diff
                    blk[0] = preds[ci]
                    _decode_ac(dec, ac_stats[ta], fixed, blk, kx)


def encode_jpeg_arith(
    arr, subsample: bool = False, grayscale: bool = False
) -> bytes:
    """(h, w, 3) uint8 RGB -> sequential ARITHMETIC JPEG (SOF9) with
    all-ones quant tables, explicit DAC conditioning (defaults L=0, U=1,
    Kx=5), one interleaved scan.  decode_jpeg reads it back;
    decode(arith(x)) == decode(baseline(x)) exactly (shared DCT/quant
    front half)."""
    h, w, encoded, mcux, mcuy = _prep_encode_planes(arr, subsample,
                                                    grayscale)
    nc = len(encoded)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (_zz, _bw, ch, cv) in enumerate(encoded):
        sof += bytes([i + 1, (ch << 4) | cv, 0])
    out += b"\xff\xc9" + struct.pack(">H", 2 + len(sof)) + sof
    out += b"\xff\xcc" + struct.pack(">H", 6) + bytes([0x00, 0x10,
                                                       0x10, 5])
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    enc = QMEncoder()
    dc_stats = bytearray(_DC_BINS)
    ac_stats = bytearray(_AC_BINS)
    fixed = bytearray([_FIXED_STATE])
    dc_ctx = [0] * nc
    preds = [0] * nc
    for idx in range(mcuy * mcux):
        my, mx = divmod(idx, mcux)
        for ci, (zz, bw, ch, cv) in enumerate(encoded):
            for by in range(cv):
                for bx in range(ch):
                    blk = zz[(my * cv + by) * bw + mx * ch + bx]
                    dc = int(blk[0])
                    dc_ctx[ci] = _encode_dc(
                        enc, dc_stats, dc_ctx[ci], dc - preds[ci], 0, 1
                    )
                    preds[ci] = dc
                    _encode_ac(enc, ac_stats, fixed, blk, 5)
    out += enc.finish()
    out += b"\xff\xd9"
    return bytes(out)


def _prep_encode_planes(arr, subsample, grayscale):
    from open_ocr_spark.dataops.jpeg import _prep_encode

    return _prep_encode(arr, subsample, grayscale)
