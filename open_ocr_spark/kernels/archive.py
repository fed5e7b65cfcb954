"""POSIX ustar / pax tar archive member extraction.

Crawled corpora routinely arrive as tarballs (site dumps, dataset
mirrors, software-docs bundles); the extraction dispatch gains a tar
branch so "recover the text from the document" holds for archives too:
every regular-file member routes back through the normal per-format
dispatch and the archive's text is the member texts in archive order.

From-scratch parser over the public format (POSIX.1-1988 ustar layout,
POSIX.1-2001 pax extensions):

- 512-byte header blocks: name[100] mode[8] uid[8] gid[8] size[12]
  mtime[12] chksum[8] typeflag[1] linkname[100] magic[6] version[2]
  uname[32] gname[32] devmajor[8] devminor[8] prefix[155].
- numeric fields are NUL/space-terminated octal; the checksum is the
  byte sum of the header with the chksum field read as 8 spaces.
- member data follows, zero-padded to 512; two all-zero blocks end the
  archive.
- pax extended headers (typeflag ``x``/``g``) and GNU long-name records
  (``L``/``K``) are metadata, not members: their data blocks are
  skipped. Directories (``5``), links (``1``/``2``) and specials
  (``3``/``4``/``6``/``7``) carry no text and are skipped too.

The writer twin is the stdlib ``tarfile`` module — the tests and the
oracle query parse archives written by an INDEPENDENT implementation,
so the parser can't be self-consistent with its own bugs.
"""

from __future__ import annotations

_BLOCK = 512
_MAX_MEMBERS = 4096


def is_tar(raw: bytes) -> bool:
    """ustar magic at offset 257 plus a validating header checksum — the
    checksum makes a text file that merely contains "ustar" at the right
    offset astronomically unlikely to match."""
    if len(raw) < _BLOCK or raw[257:262] != b"ustar":
        return False
    try:
        return _checksum_ok(raw[:_BLOCK])
    except ValueError:
        return False


def _octal(field: bytes) -> int:
    s = field.split(b"\x00", 1)[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError as exc:
        raise ValueError(f"bad octal field {field!r}") from exc


def _checksum_ok(header: bytes) -> bool:
    stored = _octal(header[148:156])
    computed = sum(header[:148]) + 8 * 32 + sum(header[156:])
    return stored == computed


def split_tar(raw: bytes) -> list[tuple[str, bytes]]:
    """Parse an archive into (member name, bytes) pairs for regular
    files, in archive order. Raises ValueError on a corrupt header so
    the dispatch yields an error value."""
    members: list[tuple[str, bytes]] = []
    pos = 0
    pax_path: str | None = None  # path override from the preceding x-record
    while pos + _BLOCK <= len(raw):
        header = raw[pos:pos + _BLOCK]
        if header == b"\x00" * _BLOCK:
            return members  # end-of-archive marker
        if header[257:262] != b"ustar":
            raise ValueError(f"bad tar magic at offset {pos}")
        if not _checksum_ok(header):
            raise ValueError(f"tar header checksum mismatch at offset {pos}")
        size = _octal(header[124:136])
        typeflag = header[156:157]
        pos += _BLOCK
        data_blocks = (size + _BLOCK - 1) // _BLOCK
        if typeflag in (b"0", b"\x00"):
            if pos + size > len(raw):
                raise ValueError("tar member data truncated")
            if pax_path is not None:
                name, pax_path = pax_path, None
            else:
                name = header[:100].split(b"\x00", 1)[0].decode(
                    "utf-8", errors="replace"
                )
                prefix = header[345:500].split(b"\x00", 1)[0].decode(
                    "utf-8", errors="replace"
                )
                if prefix:
                    name = f"{prefix}/{name}"
            members.append((name, raw[pos:pos + size]))
            if len(members) > _MAX_MEMBERS:
                raise ValueError(f"tar member count exceeds {_MAX_MEMBERS}")
        elif typeflag == b"x":
            # pax extended header: "len key=value\n" records; the path
            # key overrides the NEXT member's name (POSIX.1-2001)
            pax_path = _pax_path(raw[pos:pos + size]) or pax_path
        elif typeflag == b"L":
            # GNU long-name record: the data block IS the next member's
            # name, NUL-terminated (tar(5) GNU extensions)
            pax_path = (
                raw[pos:pos + size].split(b"\x00", 1)[0]
                .decode("utf-8", errors="replace")
            ) or pax_path
        else:
            # pax g, GNU K, dirs, links, specials: data skipped
            pax_path = None
        pos += data_blocks * _BLOCK
    # fell off the end without the all-zero end-of-archive block: a
    # truncated download must not silently pass as a shorter archive
    raise ValueError("tar truncated: missing end-of-archive marker")


def _pax_path(data: bytes) -> str | None:
    pos = 0
    path = None
    while pos < len(data):
        sp = data.find(b" ", pos)
        if sp < 0:
            break
        try:
            rec_len = int(data[pos:sp])
        except ValueError:
            break
        if rec_len <= 0 or pos + rec_len > len(data):
            break
        record = data[sp + 1:pos + rec_len]
        if record.startswith(b"path="):
            path = record[5:].rstrip(b"\n").decode("utf-8", errors="replace")
        pos += rec_len
    return path


def build_tar(members: list[tuple[str, bytes]]) -> bytes:
    """Writer twin via the stdlib (independent implementation):
    deterministic metadata so fixtures are byte-stable."""
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


# ---------------------------------------------------------------------------
# gzip transparent encoding + generic zip archives. gzip here is the
# STANDALONE-file form (page.html.gz, corpus.tar.gz) — the WARC layer has
# its own member-per-record reader (sources.py) and HTTP content-coding
# decode; this is the "a user handed the engine a .gz file" path.
# ---------------------------------------------------------------------------

GZIP_MAGIC = b"\x1f\x8b"

# Same hostile-input posture as the WARC layer: a gzip bomb in one row
# caps out as an error value instead of eating the executor.
MAX_GUNZIP_BYTES = 64 * 1024 * 1024


def gunzip_payload(raw: bytes, cap: int = MAX_GUNZIP_BYTES) -> bytes:
    """Decompress one (possibly multi-member) gzip stream with a size
    cap. Raises ValueError on corruption, truncation, or cap breach."""
    import zlib

    out = []
    total = 0
    data = raw
    while data[:2] == GZIP_MAGIC:
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data, cap - total + 1)
        except zlib.error as exc:
            raise ValueError(f"bad gzip stream: {exc}") from exc
        total += len(chunk)
        if total > cap:
            raise ValueError(f"gunzip output exceeds {cap} bytes")
        if not d.eof:
            raise ValueError("truncated gzip stream")
        out.append(chunk)
        data = d.unused_data
    if not out:
        raise ValueError("not a gzip stream")
    if data:
        raise ValueError("trailing garbage after gzip stream")
    return b"".join(out)


def split_zip(raw: bytes) -> list[tuple[str, bytes]]:
    """Generic zip archive → (member name, bytes) pairs for regular
    files, central-directory order; directories skipped. Bomb guard:
    declared total uncompressed size is checked BEFORE any inflate."""
    import io
    import zipfile

    try:
        zf = zipfile.ZipFile(io.BytesIO(raw))
    except (zipfile.BadZipFile, OSError) as exc:
        raise ValueError(f"bad zip container: {exc}") from exc
    with zf:
        infos = [i for i in zf.infolist() if not i.is_dir()]
        if len(infos) > _MAX_MEMBERS:
            raise ValueError(f"zip member count exceeds {_MAX_MEMBERS}")
        if sum(i.file_size for i in infos) > MAX_GUNZIP_BYTES:
            raise ValueError(
                f"zip declared size exceeds {MAX_GUNZIP_BYTES} bytes"
            )
        try:
            return [(i.filename, zf.read(i)) for i in infos]
        except (zipfile.BadZipFile, OSError, NotImplementedError,
                RuntimeError) as exc:
            # RuntimeError is zipfile's encrypted-member signal — a real
            # crawl payload class, and it must classify as
            # error:zip-unsupported, not error:internal
            raise ValueError(f"bad zip member: {exc}") from exc


def build_zip(members: list[tuple[str, bytes]]) -> bytes:
    """Writer twin: deterministic (fixed timestamps, deflate)."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return buf.getvalue()
