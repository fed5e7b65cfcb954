"""Word 97–2003 binary ``.doc`` text extraction: real CFB + piece table.

The legacy Word binary format is two public specs deep:

- **MS-CFB** (Compound File Binary): a FAT filesystem in a file —
  512-byte sectors, a FAT whose sector list lives in the header DIFAT,
  a directory stream of 128-byte entries (UTF-16 names), and a MINI
  stream (64-byte mini sectors, own mini FAT) for streams under the
  4096-byte cutoff.  Real ``.doc`` files keep small streams in the mini
  stream, so the mini layer is implemented, not skipped.
- **MS-DOC**: the ``WordDocument`` stream starts with the FIB
  (``wIdent`` 0xA5EC); bit 9 of the flags word picks which table stream
  (``0Table``/``1Table``) holds the CLX; ``fcClx``/``lcbClx`` (FIB
  offsets 0x1A2/0x1A6) locate it.  The CLX's PlcPcd maps character
  positions to text runs: each PCD's fc packs an fCompressed bit —
  set means 8-bit cp1252 text at ``fc/2`` in WordDocument, clear means
  UTF-16LE at ``fc``.  Word stores paragraph marks as ``\\r`` and cell
  marks as ``\\x07``; the frozen output policy maps both to ``\\n`` and
  drops other C0 controls (keeping ``\\t``).

``build_doc`` is the encoder twin: it writes a real CFB (FAT,
directory, mini FAT, mini stream) around a real FIB + piece table, so
the oracle can state expected text closed-form while the parser walks
every container layer.  Everything is bounds-checked; malformed input
raises ValueError for the kernel's error-as-value contract.
"""

from __future__ import annotations

import struct

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD
_MAX_CHAIN = 1 << 20  # hostile-input cap


def is_cfb(raw: bytes) -> bool:
    return raw[:8] == _CFB_MAGIC


# --- CFB reader ------------------------------------------------------------------


def _u16(b, o):
    return struct.unpack_from("<H", b, o)[0]


def _u32(b, o):
    return struct.unpack_from("<I", b, o)[0]


class _Cfb:
    def __init__(self, raw: bytes):
        if len(raw) < 512 or not is_cfb(raw):
            raise ValueError("doc: not a CFB container")
        self.raw = raw
        self.ssize = 1 << _u16(raw, 30)
        self.msize = 1 << _u16(raw, 32)
        if self.ssize not in (512, 4096) or self.msize != 64:
            raise ValueError("doc: unsupported CFB sector shape")
        self.mini_cutoff = _u32(raw, 56)
        dir_start = _u32(raw, 48)
        minifat_start = _u32(raw, 60)
        # DIFAT: the header's 109 entries (DIFAT sector chains appear
        # only past 6.8 MB of FAT — out of scope, error not misread)
        if _u32(raw, 72) != 0:
            raise ValueError("doc: DIFAT overflow sectors unsupported")
        fat_sectors = [
            _u32(raw, 76 + 4 * i)
            for i in range(109)
            if _u32(raw, 76 + 4 * i) not in (_FREESECT, _ENDOFCHAIN)
        ]
        self.fat: list[int] = []
        for s in fat_sectors:
            self.fat.extend(
                struct.unpack_from(
                    f"<{self.ssize // 4}I", self._sector(s), 0
                )
            )
        self.dir = self._chain_bytes(dir_start)
        self.entries = self._read_dir()
        root = next(
            (e for e in self.entries if e["type"] == 5), None
        )
        if root is None:
            raise ValueError("doc: CFB has no root entry")
        self.mini_stream = self._chain_bytes(root["start"])[: root["size"]]
        self.minifat: list[int] = []
        if minifat_start not in (_ENDOFCHAIN, _FREESECT):
            mf = self._chain_bytes(minifat_start)
            self.minifat = list(
                struct.unpack_from(f"<{len(mf) // 4}I", mf, 0)
            )

    def _sector(self, i: int) -> bytes:
        off = (i + 1) * self.ssize
        if off + self.ssize > len(self.raw):
            raise ValueError("doc: sector past end of file")
        return self.raw[off : off + self.ssize]

    def _chain_bytes(self, start: int) -> bytes:
        out, s, seen = [], start, 0
        while s not in (_ENDOFCHAIN, _FREESECT):
            if s >= len(self.fat) or seen > _MAX_CHAIN:
                raise ValueError("doc: broken FAT chain")
            out.append(self._sector(s))
            s = self.fat[s]
            seen += 1
        return b"".join(out)

    def _read_dir(self) -> list[dict]:
        entries = []
        for off in range(0, len(self.dir) - 127, 128):
            e = self.dir[off : off + 128]
            nlen = _u16(e, 64)
            if nlen < 2 or nlen > 64:
                continue
            entries.append(
                {
                    "name": e[: nlen - 2].decode("utf-16-le", "replace"),
                    "type": e[66],
                    "start": _u32(e, 116),
                    "size": _u32(e, 120),  # < 2 GiB in practice
                }
            )
        return entries

    def stream(self, name: str) -> bytes:
        e = next(
            (x for x in self.entries if x["type"] == 2 and x["name"] == name),
            None,
        )
        if e is None:
            raise ValueError(f"doc: no stream {name!r}")
        if e["size"] < self.mini_cutoff:
            out, s, seen = [], e["start"], 0
            while s not in (_ENDOFCHAIN, _FREESECT):
                if s >= len(self.minifat) or seen > _MAX_CHAIN:
                    raise ValueError("doc: broken mini FAT chain")
                off = s * self.msize
                out.append(self.mini_stream[off : off + self.msize])
                s = self.minifat[s]
                seen += 1
            return b"".join(out)[: e["size"]]
        return self._chain_bytes(e["start"])[: e["size"]]


# --- MS-DOC text -----------------------------------------------------------------

_FC_CLX = 0x01A2
_LCB_CLX = 0x01A6


def _clean(text: str) -> str:
    out = []
    for ch in text:
        if ch in ("\r", "\x07", "\x0b", "\x0c"):
            out.append("\n")
        elif ch == "\t" or ch >= " ":
            out.append(ch)
        # other C0 controls (field marks etc.) drop
    return "".join(out)


def extract_doc_text(raw: bytes) -> str:
    """Text of a Word 97–2003 binary document, pieces in CP order,
    paragraph/cell marks normalized to newlines (module header for the
    full policy).  Raises ValueError on any structural problem."""
    cfb = _Cfb(bytes(raw))
    word = cfb.stream("WordDocument")
    if len(word) < _LCB_CLX + 4 or _u16(word, 0) != 0xA5EC:
        raise ValueError("doc: WordDocument stream has no FIB")
    which = (_u16(word, 0x0A) >> 9) & 1
    table = cfb.stream(f"{which}Table")
    fc_clx, lcb_clx = _u32(word, _FC_CLX), _u32(word, _LCB_CLX)
    if lcb_clx == 0 or fc_clx + lcb_clx > len(table):
        raise ValueError("doc: CLX out of range")
    clx = table[fc_clx : fc_clx + lcb_clx]
    pos = 0
    while pos < len(clx) and clx[pos] == 1:  # Prc (property mods): skip
        if pos + 3 > len(clx):
            raise ValueError("doc: truncated Prc")
        pos += 3 + _u16(clx, pos + 1)
    if pos + 5 > len(clx) or clx[pos] != 2:
        raise ValueError("doc: CLX has no Pcdt")
    lcb = _u32(clx, pos + 1)
    plc = clx[pos + 5 : pos + 5 + lcb]
    if len(plc) != lcb or lcb < 4 or (lcb - 4) % 12 != 0:
        raise ValueError("doc: malformed PlcPcd")
    n = (lcb - 4) // 12
    cps = [_u32(plc, 4 * i) for i in range(n + 1)]
    pieces = []
    for i in range(n):
        pcd = plc[4 * (n + 1) + 8 * i :][:8]
        fc_raw = _u32(pcd, 2)
        ncp = cps[i + 1] - cps[i]
        if ncp < 0:
            raise ValueError("doc: CPs not monotone")
        if (fc_raw >> 30) & 1:  # fCompressed: 8-bit cp1252 at fc/2
            fc = (fc_raw & 0x3FFFFFFF) // 2
            seg = word[fc : fc + ncp]
            if len(seg) != ncp:
                raise ValueError("doc: piece past WordDocument end")
            pieces.append(seg.decode("cp1252"))
        else:
            fc = fc_raw & 0x3FFFFFFF
            seg = word[fc : fc + 2 * ncp]
            if len(seg) != 2 * ncp:
                raise ValueError("doc: piece past WordDocument end")
            pieces.append(seg.decode("utf-16-le"))
    return _clean("".join(pieces))


# --- encoder twin ----------------------------------------------------------------


def _dir_entry(name: str, typ: int, start: int, size: int,
               color: int = 1, child: int = 0xFFFFFFFF,
               left: int = 0xFFFFFFFF, right: int = 0xFFFFFFFF) -> bytes:
    raw16 = name.encode("utf-16-le")
    e = bytearray(128)
    e[: len(raw16)] = raw16
    struct.pack_into("<H", e, 64, len(raw16) + 2)
    e[66] = typ
    e[67] = color
    struct.pack_into("<III", e, 68, left, right, child)
    struct.pack_into("<I", e, 116, start)
    struct.pack_into("<I", e, 120, size)
    return bytes(e)


def _build_cfb(streams: list[tuple[str, bytes]]) -> bytes:
    """Minimal-but-real CFB: streams under 4096 bytes go through the
    MINI stream + mini FAT (so the reader's mini layer is exercised);
    larger ones take regular FAT chains."""
    ssize, msize, cutoff = 512, 64, 4096

    def pad(b: bytes, unit: int) -> bytes:
        return b + b"\x00" * (-len(b) % unit)

    minis = [(n, d) for n, d in streams if len(d) < cutoff]
    bigs = [(n, d) for n, d in streams if len(d) >= cutoff]
    # mini stream + mini FAT
    mini_stream = bytearray()
    minifat: list[int] = []
    mini_starts: dict[str, int] = {}
    for name, data in minis:
        chunks = pad(data, msize)
        first = len(minifat)
        nsec = len(chunks) // msize
        mini_starts[name] = first if nsec else _ENDOFCHAIN
        for k in range(nsec):
            minifat.append(first + k + 1 if k < nsec - 1 else _ENDOFCHAIN)
        mini_stream += chunks
    mini_stream = bytes(mini_stream)
    minifat_bytes = pad(
        b"".join(struct.pack("<I", v) for v in minifat), ssize
    ) if minifat else b""

    # regular-sector layout: [FAT][dir][minifat...][ministream...][bigs...]
    sectors: list[bytes] = []
    fat: list[int] = []

    def add_stream(data: bytes) -> int:
        if not data:
            return _ENDOFCHAIN
        chunks = pad(data, ssize)
        first = len(sectors)
        nsec = len(chunks) // ssize
        for k in range(nsec):
            sectors.append(chunks[k * ssize : (k + 1) * ssize])
            fat.append(first + k + 1 if k < nsec - 1 else _ENDOFCHAIN)
        return first

    fat_sector_idx = len(sectors)
    sectors.append(b"")  # FAT itself, patched last
    fat.append(_FATSECT)
    dir_data = bytearray()
    dir_sector_idx = len(sectors)
    sectors.append(b"")  # directory, patched after starts known
    fat.append(_ENDOFCHAIN)
    minifat_start = add_stream(minifat_bytes)
    ministream_start = add_stream(mini_stream)
    big_starts = {n: add_stream(d) for n, d in bigs}

    entries = [
        _dir_entry("Root Entry", 5, ministream_start, len(mini_stream),
                   child=1),
    ]
    for name, data in streams:
        start = (
            mini_starts[name] if len(data) < cutoff else big_starts[name]
        )
        entries.append(_dir_entry(name, 2, start, len(data)))
    while len(entries) % 4:
        entries.append(b"\x00" * 128)
    dir_data = b"".join(entries)
    if len(dir_data) > ssize:
        raise ValueError("doc twin: too many streams for one dir sector")
    sectors[dir_sector_idx] = pad(dir_data, ssize)

    fat_bytes = b"".join(struct.pack("<I", v) for v in fat)
    if len(fat_bytes) > ssize:
        raise ValueError("doc twin: file too large for one FAT sector")
    sectors[fat_sector_idx] = pad(
        fat_bytes + struct.pack("<I", _FREESECT) * 0, ssize
    ).ljust(ssize, b"\xff")[:ssize]
    # unused FAT slots must read FREESECT (0xFFFFFFFF)
    used = len(fat_bytes)
    sectors[fat_sector_idx] = fat_bytes + b"\xff" * (ssize - used)

    header = bytearray(512)
    header[:8] = _CFB_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor version
    struct.pack_into("<H", header, 26, 3)  # major 3 -> 512B sectors
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # sector shift
    struct.pack_into("<H", header, 32, 6)  # mini shift
    struct.pack_into("<I", header, 44, 1)  # one FAT sector
    struct.pack_into("<I", header, 48, dir_sector_idx)
    struct.pack_into("<I", header, 56, cutoff)
    struct.pack_into(
        "<I", header, 60,
        minifat_start if minifat_bytes else _ENDOFCHAIN,
    )
    struct.pack_into(
        "<I", header, 64, 1 if minifat_bytes else 0
    )
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<I", header, 76, fat_sector_idx)
    for i in range(1, 109):
        struct.pack_into("<I", header, 76 + 4 * i, _FREESECT)
    return bytes(header) + b"".join(sectors)


def build_doc(pieces: list[tuple[str, bool]], which_table: int = 1) -> bytes:
    """Encoder twin: a real ``.doc`` whose extract_doc_text output is
    exactly the pieces' text (post-normalization).  Each piece is
    (text, compressed): compressed=True stores cp1252 single-byte text,
    False stores UTF-16LE — both PCD forms exercised."""
    fib = bytearray(1472)
    struct.pack_into("<H", fib, 0, 0xA5EC)
    struct.pack_into("<H", fib, 2, 0x00C1)  # nFib: Word 97
    struct.pack_into("<H", fib, 0x0A, (which_table & 1) << 9)
    word = bytearray(fib)
    cps = [0]
    pcds = []
    for text, compressed in pieces:
        if compressed:
            data = text.encode("cp1252")
            fc_raw = (1 << 30) | (len(word) * 2)
        else:
            data = text.encode("utf-16-le")
            fc_raw = len(word)
        word += data
        cps.append(cps[-1] + len(text))
        pcd = bytearray(8)
        struct.pack_into("<I", pcd, 2, fc_raw)
        pcds.append(bytes(pcd))
    plc = b"".join(struct.pack("<I", cp) for cp in cps) + b"".join(pcds)
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    table = clx  # fcClx = 0
    struct.pack_into("<I", word, _FC_CLX, 0)
    struct.pack_into("<I", word, _LCB_CLX, len(clx))
    return _build_cfb(
        [("WordDocument", bytes(word)), (f"{which_table}Table", table)]
    )


# --- PowerPoint 97-2003 (.ppt) ----------------------------------------------------
# MS-PPT: the 'PowerPoint Document' stream is a tree of 8-byte-header
# records (recVerAndInstance u16, recType u16, recLen u32); a record
# with recVer 0xF is a container whose body is more records.  Slide
# text lives in TextCharsAtom (0x0FA0, UTF-16LE) and TextBytesAtom
# (0x0FA8, single-byte cp1252); PPT uses \r line breaks, normalized by
# the same _clean policy as Word.

_PPT_TEXT_CHARS = 0x0FA0
_PPT_TEXT_BYTES = 0x0FA8


def extract_ppt_text(raw: bytes) -> str:
    """Concatenated slide text of a binary .ppt, atoms in stream order,
    one line per text atom.  Raises ValueError on structural damage."""
    cfb = _Cfb(bytes(raw))
    buf = cfb.stream("PowerPoint Document")
    texts: list[str] = []

    def walk(b: bytes, depth: int) -> None:
        if depth > 32:
            raise ValueError("ppt: record tree too deep")
        pos = 0
        while pos + 8 <= len(b):
            ver_inst = _u16(b, pos)
            rec_type = _u16(b, pos + 2)
            rec_len = _u32(b, pos + 4)
            body = b[pos + 8 : pos + 8 + rec_len]
            if len(body) != rec_len:
                raise ValueError("ppt: record past stream end")
            if (ver_inst & 0xF) == 0xF:
                walk(body, depth + 1)
            elif rec_type == _PPT_TEXT_CHARS:
                texts.append(body.decode("utf-16-le", "strict"))
            elif rec_type == _PPT_TEXT_BYTES:
                texts.append(body.decode("cp1252"))
            pos += 8 + rec_len

    walk(buf, 0)
    return _clean("\r".join(texts) + ("\r" if texts else ""))


def build_ppt(texts: list[tuple[str, bool]]) -> bytes:
    """Encoder twin: a .ppt whose extract_ppt_text output is the texts
    joined as lines.  Each entry is (text, wide): wide=True emits a
    TextCharsAtom (UTF-16), False a TextBytesAtom (cp1252).  Atoms nest
    inside a Document container to exercise the tree walk."""
    atoms = bytearray()
    for text, wide in texts:
        if wide:
            body = text.encode("utf-16-le")
            rec_type = _PPT_TEXT_CHARS
        else:
            body = text.encode("cp1252")
            rec_type = _PPT_TEXT_BYTES
        atoms += struct.pack("<HHI", 0x0000, rec_type, len(body)) + body
    document = struct.pack("<HHI", 0x000F, 0x03E8, len(atoms)) + atoms
    return _build_cfb(
        [
            ("PowerPoint Document", bytes(document)),
            ("Current User", b"\x00" * 24),
        ]
    )


# --- Excel 97-2003 (.xls) ---------------------------------------------------------
# MS-XLS (BIFF8): the 'Workbook' stream is a flat run of (type u16,
# len u16, body) records.  Document text lives in the SST shared-string
# table (0x00FC): cstTotal, cstUnique, then XLUnicodeRichExtendedString
# entries — cch u16, grbit u8 (bit0 fHighByte: 0 = compressed 8-bit
# latin, 1 = UTF-16LE; bit2 fExtSt; bit3 fRichSt), optional cRun u16 /
# cbExtRst u32, the characters, then the skipped rich-run/ext blocks.
# Frozen subset: SST entries split across CONTINUE records raise (the
# writer twin never splits; real giant SSTs would need the continuation
# grammar) — error-as-value, never silent truncation.

_XLS_BOF = 0x0809
_XLS_SST = 0x00FC


def extract_xls_text(raw: bytes) -> str:
    """The shared-string-table text of a binary .xls, one line per SST
    entry, in table order.  Raises ValueError on structural damage or a
    CONTINUE-split SST (declared out of the frozen subset)."""
    cfb = _Cfb(bytes(raw))
    try:
        buf = cfb.stream("Workbook")
    except ValueError:
        buf = cfb.stream("Book")  # BIFF5 naming
    pos = 0
    first = True
    out: list[str] = []
    while pos + 4 <= len(buf):
        rec_type = _u16(buf, pos)
        rec_len = _u16(buf, pos + 2)
        body = buf[pos + 4 : pos + 4 + rec_len]
        if len(body) != rec_len:
            raise ValueError("xls: record past stream end")
        if first:
            if rec_type != _XLS_BOF or rec_len < 4 or _u16(body, 0) != 0x0600:
                raise ValueError("xls: stream does not begin with BIFF8 BOF")
            first = False
        if rec_type == _XLS_SST:
            if rec_len < 8:
                raise ValueError("xls: SST header truncated")
            n_unique = _u32(body, 4)
            p = 8
            for _ in range(n_unique):
                if p + 3 > len(body):
                    raise ValueError(
                        "xls: SST spans CONTINUE records (unsupported)"
                    )
                cch = _u16(body, p)
                grbit = body[p + 2]
                p += 3
                c_run = 0
                cb_ext = 0
                if grbit & 0x08:  # fRichSt
                    c_run = _u16(body, p)
                    p += 2
                if grbit & 0x04:  # fExtSt
                    cb_ext = _u32(body, p)
                    p += 4
                width = 2 if (grbit & 0x01) else 1
                chars = body[p : p + width * cch]
                if len(chars) != width * cch:
                    raise ValueError(
                        "xls: SST spans CONTINUE records (unsupported)"
                    )
                p += width * cch
                out.append(
                    chars.decode("utf-16-le")
                    if width == 2
                    else chars.decode("latin-1")
                )
                p += 4 * c_run + cb_ext
                if p > len(body):
                    raise ValueError("xls: SST rich/ext block truncated")
        pos += 4 + rec_len
    return _clean("\r".join(out) + ("\r" if out else ""))


def build_xls(strings: list[tuple[str, bool]]) -> bytes:
    """Encoder twin: a .xls whose extract_xls_text output is the
    strings as lines.  Each entry is (text, wide): wide=True stores
    UTF-16, False compressed 8-bit latin-1.  One string gets a fake
    rich-run block to exercise the skip arithmetic."""
    sst = bytearray(struct.pack("<II", len(strings), len(strings)))
    for idx, (text, wide) in enumerate(strings):
        rich = idx == 0 and len(strings) > 1
        grbit = (0x01 if wide else 0x00) | (0x08 if rich else 0x00)
        data = text.encode("utf-16-le") if wide else text.encode("latin-1")
        sst += struct.pack("<HB", len(text), grbit)
        if rich:
            sst += struct.pack("<H", 2)  # cRun
        sst += data
        if rich:
            sst += b"\x00" * 8  # 2 FormatRun entries, skipped
    bof = struct.pack("<HH", 0x0600, 0x0005) + b"\x00" * 12
    workbook = (
        struct.pack("<HH", _XLS_BOF, len(bof)) + bof
        + struct.pack("<HH", _XLS_SST, len(sst)) + bytes(sst)
        + struct.pack("<HH", 0x000A, 0)  # EOF
    )
    return _build_cfb([("Workbook", workbook)])


def extract_cfb_text(raw: bytes) -> str:
    """Route a CFB payload by its directory: WordDocument -> .doc,
    PowerPoint Document -> .ppt, Workbook/Book -> .xls.  A CFB that is
    none of the three raises (error-as-value upstream) rather than
    guessing."""
    cfb = _Cfb(bytes(raw))
    names = {e["name"] for e in cfb.entries if e["type"] == 2}
    if "WordDocument" in names:
        return extract_doc_text(raw)
    if "PowerPoint Document" in names:
        return extract_ppt_text(raw)
    if "Workbook" in names or "Book" in names:
        return extract_xls_text(raw)
    if any(n.startswith("__substg1.0_") for n in names):
        return extract_msg_text(raw)
    raise ValueError(
        "doc: CFB container holds no Word/PowerPoint/Excel/Outlook stream"
    )


# --- Outlook (.msg) ---------------------------------------------------------------
# MS-OXMSG: an Outlook item is a CFB whose property streams are named
# ``__substg1.0_TTTTIIII`` — TTTT the property tag (0x0037 subject,
# 0x1000 body), IIII the type (001F UTF-16LE, 001E 8-bit cp1252).  The
# frozen text contract is subject, blank line, body.

_MSG_SUBJECT = "0037"
_MSG_BODY = "1000"


def _msg_prop(cfb: _Cfb, tag: str) -> str | None:
    for typ, codec in (("001F", "utf-16-le"), ("001E", "cp1252")):
        name = f"__substg1.0_{tag}{typ}"
        try:
            return cfb.stream(name).decode(codec)
        except ValueError:
            continue
    return None


def extract_msg_text(raw: bytes) -> str:
    """Subject + body of an Outlook .msg (either string type per
    property).  Raises ValueError when neither property exists (not a
    message) or on container damage."""
    cfb = _Cfb(bytes(raw))
    subject = _msg_prop(cfb, _MSG_SUBJECT)
    body = _msg_prop(cfb, _MSG_BODY)
    if subject is None and body is None:
        raise ValueError("msg: no subject or body property stream")
    parts = [p for p in (subject, body) if p]
    return _clean("\r\r".join(parts) + ("\r" if parts else ""))


def build_msg(subject: str, body: str, wide: bool = True) -> bytes:
    """Encoder twin: a .msg whose extract_msg_text output is
    'subject\\n\\nbody\\n'.  wide picks the 001F (UTF-16) or 001E
    (cp1252) property type for both streams."""
    typ = "001F" if wide else "001E"
    codec = "utf-16-le" if wide else "cp1252"
    return _build_cfb(
        [
            (f"__substg1.0_{_MSG_SUBJECT}{typ}", subject.encode(codec)),
            (f"__substg1.0_{_MSG_BODY}{typ}", body.encode(codec)),
        ]
    )
