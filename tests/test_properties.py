"""Property tier (hypothesis): the kernel guarantees that make the
distributed pipeline safe — total functions (never raise on any bytes),
determinism (same bytes → same text, any order), and normalization
invariants. The reference has no property tests (SURVEY §5.1); these guard
OUR hard requirements (byte-stability, SURVEY §7.3)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from open_ocr_spark.kernels.dispatch import extract_document
from open_ocr_spark.kernels.html_extract import extract_main_text
from open_ocr_spark.kernels.htmltree import collapse_ws, parse_html
from open_ocr_spark.kernels.options import execution_order, resolve_engine
from open_ocr_spark.kernels.pdf_text import is_pdf

BINARY = st.binary(max_size=2000)
MOSTLY_HTML = st.text(
    alphabet=st.sampled_from(list("<>/ab c=\"'&;#!-\n\tp")), max_size=400
)


@given(BINARY)
@settings(max_examples=300, deadline=None)
def test_extract_document_total_on_bytes(payload):
    text, status, error = extract_document(payload)
    assert isinstance(text, str) and isinstance(status, str)
    assert status == "ok" or status.startswith("error:")


@given(MOSTLY_HTML)
@settings(max_examples=300, deadline=None)
def test_extract_total_on_taglike_text(s):
    out = extract_main_text(s.encode())
    assert isinstance(out, str)


@given(BINARY)
@settings(max_examples=150, deadline=None)
def test_extract_deterministic(payload):
    assert extract_document(payload) == extract_document(payload)


@given(MOSTLY_HTML)
@settings(max_examples=200, deadline=None)
def test_output_whitespace_invariant(s):
    """Frozen normalization: output never has leading/trailing whitespace,
    runs of spaces, or lone newlines (paragraph breaks are exactly \\n\\n)."""
    out = extract_main_text(s.encode())
    if out:
        assert out == out.strip()
        for para in out.split("\n\n"):
            assert "  " not in para
            assert "\n" not in para


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_collapse_ws_idempotent(s):
    once = collapse_ws(s)
    assert collapse_ws(once) == once


@given(BINARY)
@settings(max_examples=200, deadline=None)
def test_parse_never_raises(payload):
    root = parse_html(payload)
    assert root.tag == "#document"


@given(st.lists(st.text(min_size=1, max_size=10), max_size=6))
@settings(max_examples=100, deadline=None)
def test_chain_order_is_reverse(chain):
    assert execution_order(chain) == list(reversed(chain))


@given(st.one_of(st.none(), st.integers(-5, 10), st.text(max_size=12)))
@settings(max_examples=100, deadline=None)
def test_resolve_engine_total(value):
    assert resolve_engine(value) in {"tesseract", "go_tesseract", "mock"}


@given(BINARY)
@settings(max_examples=100, deadline=None)
def test_is_pdf_only_prefix(payload):
    assert is_pdf(payload) == (bytes(payload[:4]) == b"%PDF")
