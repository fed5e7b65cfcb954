"""Jupyter notebook (.ipynb) extraction branch.

Crawled corpora carry notebooks wherever they carry code — GitHub
mirrors, docs sites, course pages — and "recover the text from the
document" (the reference's extraction contract, ocr_http_handler.go)
for a notebook means the cell sources in document order: the prose AND
the code carry signal, plus any textual outputs a code cell recorded.

From-scratch reader over the public nbformat 4.x JSON schema
(https://nbformat.readthedocs.io/ — a notebook is ``{"cells": [...],
"nbformat": 4, ...}``; each cell ``{"cell_type": "markdown"|"code"|
"raw", "source": str | [lines...]}`` where a source list holds
keepends-split lines). Deterministic rendering rules, pinned by the
writer twin and a differential test against the stdlib ``json`` module:

- cells render in list order, joined by blank lines;
- ``source`` may be one string or a list of keepends lines; lists join
  verbatim (the two spellings are wire-equivalent by the schema);
- markdown, code, and raw cells all render their source (raw cells are
  literal passthrough by the nbformat contract);
- code-cell outputs render after the source, in output order: ``stream``
  text, ``execute_result`` / ``display_data`` ``text/plain`` data, and
  ``error`` as ``ename: evalue`` (traceback frames dropped — they carry
  ANSI escapes and environment noise, not content);
- each rendered block is stripped of trailing newlines so the join is
  the only separator.

Totality: ``is_ipynb`` gates on the JSON parse AND the nbformat/cells
shape, so arbitrary JSON keeps routing to the generic branches;
``extract_ipynb_text`` raises ValueError only (malformed JSON after a
positive sniff, hostile-input caps), per the dispatch error-as-value
contract (SURVEY §2.A17).
"""

from __future__ import annotations

import json

_MAX_CELLS = 10_000       # hostile-input cap: one payload, ~10k cells
_MAX_TEXT = 20 * 1 << 20  # rendered-text cap, mirrors MAX_DOC_BYTES


def _jsonish(payload: bytes) -> bool:
    """Cheap pre-gate: first non-whitespace byte opens a JSON object and
    the nbformat key appears somewhere — so ordinary pages never pay for
    a JSON parse in the sniff."""
    head = payload[:64].lstrip(b" \t\r\n")
    return head[:1] == b"{" and b'"nbformat"' in payload


def _load(payload: bytes):
    """Parsed JSON value or None. The dispatch sniffs and THEN extracts
    the same payload, so a 2-slot memo makes the hot path a single
    parse per document instead of two (the keys are the payload bytes
    themselves — no hashing beyond dict lookup, bounded residency)."""
    cached = _LOAD_MEMO.get(payload)
    if cached is not None:
        return cached[0]
    try:
        nb = json.loads(payload.decode("utf-8", errors="replace"))
    except (ValueError, RecursionError):
        nb = None
    if len(_LOAD_MEMO) >= 2:
        _LOAD_MEMO.clear()
    _LOAD_MEMO[payload] = (nb,)
    return nb


_LOAD_MEMO: dict[bytes, tuple] = {}


def is_ipynb(payload: bytes) -> bool:
    """True iff the payload parses as a notebook-shaped JSON object:
    a dict with an integer ``nbformat`` and a ``cells`` list."""
    if not _jsonish(payload):
        return False
    nb = _load(payload)
    return (
        isinstance(nb, dict)
        and isinstance(nb.get("nbformat"), int)
        and isinstance(nb.get("cells"), list)
    )


def _as_text(src) -> str | None:
    """A source/text field is a string or a list of keepends lines
    (wire-equivalent by the schema); anything else is None."""
    if isinstance(src, str):
        return src
    if isinstance(src, list) and all(isinstance(x, str) for x in src):
        return "".join(src)
    return None


def _output_text(out) -> str | None:
    """Textual rendering of one code-cell output, or None for binary
    (image/*) and unrecognized output types."""
    if not isinstance(out, dict):
        return None
    kind = out.get("output_type")
    if kind == "stream":
        return _as_text(out.get("text"))
    if kind in ("execute_result", "display_data"):
        data = out.get("data")
        if isinstance(data, dict):
            return _as_text(data.get("text/plain"))
        return None
    if kind == "error":
        ename = out.get("ename")
        evalue = out.get("evalue")
        if isinstance(ename, str) and isinstance(evalue, str):
            return f"{ename}: {evalue}"
    return None


def extract_ipynb_text(payload: bytes) -> str:
    """Render a notebook payload to text. ValueError only."""
    nb = _load(payload)
    if nb is None:
        raise ValueError("notebook JSON parse failed")
    cells = nb.get("cells") if isinstance(nb, dict) else None
    if not isinstance(cells, list):
        raise ValueError("notebook has no cells list")
    if len(cells) > _MAX_CELLS:
        raise ValueError(f"notebook cell count exceeds {_MAX_CELLS}")
    blocks: list[str] = []
    total = 0
    for cell in cells:
        if not isinstance(cell, dict):
            continue
        src = _as_text(cell.get("source"))
        if src is not None and src.strip():
            blocks.append(src.rstrip("\n"))
            total += len(blocks[-1])
        outputs = cell.get("outputs")
        if cell.get("cell_type") == "code" and isinstance(outputs, list):
            for out in outputs:
                t = _output_text(out)
                if t is not None and t.strip():
                    blocks.append(t.rstrip("\n"))
                    total += len(blocks[-1])
        if total > _MAX_TEXT:
            raise ValueError(f"rendered notebook text exceeds {_MAX_TEXT}")
    return "\n\n".join(blocks)


def build_ipynb(cells: list[tuple[str, str]], *,
                outputs: dict[int, list] | None = None) -> bytes:
    """Writer twin: serialize (cell_type, source) pairs through the
    stdlib json module — the independent implementation the property
    tests compare against. Sources are written in the LIST-of-keepends
    spelling (the form real kernels emit) so the extractor's list join
    is exercised on every fixture; ``outputs`` attaches raw nbformat
    output dicts to the code cell at the given index."""
    out_cells = []
    for idx, (cell_type, source) in enumerate(cells):
        cell: dict = {
            "cell_type": cell_type,
            "metadata": {},
            "source": source.splitlines(keepends=True),
        }
        if cell_type == "code":
            cell["execution_count"] = idx + 1
            cell["outputs"] = (outputs or {}).get(idx, [])
        out_cells.append(cell)
    nb = {
        "cells": out_cells,
        "metadata": {"language_info": {"name": "python"}},
        "nbformat": 4,
        "nbformat_minor": 5,
    }
    return json.dumps(nb, ensure_ascii=False, indent=1).encode("utf-8")
