"""Source-connector tier: binaryFile ingestion and the reference's JSON
request surface (verbatim field names from ocr_request.go:6-17), end-to-end
through the extraction stage."""

import base64
import json

import pyspark.sql.functions as F

from open_ocr_spark.kernels.mock import MOCK_ENGINE_RESPONSE
from open_ocr_spark.pipeline.stages import extract_stage
from open_ocr_spark.sources import pages_from_binary_files, requests_from_json

HTML = (
    b"<html><body><nav><a href='/'>Home</a></nav>"
    b"<article><p>File content body here.</p></article></body></html>"
)


def test_binary_file_source(spark, tmp_path):
    d = tmp_path / "rawpages"
    d.mkdir()
    (d / "a.html").write_bytes(HTML)
    (d / "b.html").write_bytes(HTML.replace(b"File content", b"Other text"))
    pages = pages_from_binary_files(spark, str(d), glob="*.html")
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    out = {r["url"].rsplit("/", 1)[-1]: r for r in extract_stage(pages).collect()}
    assert out["a.html"]["extracted_text"] == "File content body here."
    assert out["b.html"]["extracted_text"] == "Other text body here."


def _req(**kw):
    return (json.dumps(kw),)


def test_json_request_surface(spark):
    b64 = base64.b64encode(HTML).decode()
    rows = [
        _req(img_url="http://x/1", img_base64=b64, engine="tesseract"),
        _req(img_url="http://x/2", img_base64=b64, engine="mock"),
        # unknown engine string defaults to mock (ocr_engine.go:58-60)
        _req(img_url="http://x/3", img_base64=b64, engine="tesseract_v9"),
        # engine_args nested exactly as the reference's JSON
        _req(
            img_url="http://x/4",
            img_base64=b64,
            engine="tesseract",
            engine_args={
                "config_vars": {"tessedit_create_hocr": "1"},
                "psm": "3",
                "lang": "eng",
            },
        ),
        # reverse-order chain + swt arg, reference key "preprocessor-args"
        _req(
            img_url="http://x/5",
            img_base64=b64,
            engine="tesseract",
            preprocessors=["identity"],
            **{"preprocessor-args": {"stroke-width-transform": "1"}},
        ),
    ]
    df = spark.createDataFrame(rows, "request string")
    pages = requests_from_json(df)
    got = {r["url"]: r for r in extract_stage(pages).collect()}

    assert got["http://x/1"]["extracted_text"] == "File content body here."
    assert got["http://x/2"]["extracted_text"] == MOCK_ENGINE_RESPONSE
    assert got["http://x/3"]["extracted_text"] == MOCK_ENGINE_RESPONSE
    spans = json.loads(got["http://x/4"]["extracted_text"])["spans"]
    assert spans[0]["text"] == "File content body here."
    assert got["http://x/5"]["status"] == "ok"


def test_json_request_ingest_deterministic(spark):
    """Two runs of the same ingest must produce byte-identical frames —
    warc_ts is a caller-controlled constant, never current_timestamp()
    (ADVICE r2: a wall-clock column broke rerun identity)."""
    b64 = base64.b64encode(HTML).decode()
    df = spark.createDataFrame(
        [_req(img_url=f"http://x/{i}", img_base64=b64) for i in range(5)],
        "request string",
    )
    first = sorted(map(tuple, requests_from_json(df).collect()))
    second = sorted(map(tuple, requests_from_json(df).collect()))
    assert first == second
    # and the stamp is the documented constant, overridable by the caller
    custom = requests_from_json(df, ingest_ts="2025-06-30 12:00:00").first()
    assert str(custom["warc_ts"]) == "2025-06-30 12:00:00"


def test_json_request_lang_gate(spark):
    b64 = base64.b64encode(HTML).decode()
    df = spark.createDataFrame(
        [_req(img_url="http://x/9", img_base64=b64,
              engine_args={"lang": "klingon"})],
        "request string",
    )
    got = extract_stage(requests_from_json(df)).collect()[0]
    assert got["status"] == "error:lang"


# --- multipart/related (A4, ocr_http_multipart_handler.go:26-88) ------------


def _multipart_body(parts):
    """parts: list of (content_type, payload bytes)."""
    boundary = "bnd42"
    out = []
    for ctype, payload in parts:
        out.append(f"--{boundary}\r\nContent-Type: {ctype}\r\n\r\n".encode())
        out.append(payload)
        out.append(b"\r\n")
    out.append(f"--{boundary}--\r\n".encode())
    return b"".join(out), f'multipart/related; boundary="{boundary}"'


def test_multipart_json_plus_image(spark):
    import json

    from open_ocr_spark.sources import requests_from_multipart

    req = {"img_url": "https://x/1", "engine": "tesseract",
           "preprocessors": ["stroke-width-transform"],
           "engine_args": {"lang": "eng"}, "inplace_decode": True}
    body, ctype = _multipart_body([
        ("application/json", json.dumps(req).encode()),
        ("image/png", b"\x89PNGpayload"),
    ])
    df = spark.createDataFrame(
        [(bytearray(body), ctype)], "body binary, content_type string"
    )
    row = requests_from_multipart(df).collect()[0]
    assert row["error"] is None
    assert row["url"] == "https://x/1"
    assert bytes(row["html"]) == b"\x89PNGpayload"
    assert row["engine"] == "tesseract"
    assert row["preprocessors"] == ["stroke-width-transform"]
    assert row["lang"] == "eng"
    assert row["inplace_decode"] is True
    assert '"lang": "eng"' in row["engine_args_json"]


def test_multipart_first_image_wins_and_ends_parsing(spark):
    import json

    from open_ocr_spark.sources import requests_from_multipart

    body, ctype = _multipart_body([
        ("image/jpeg", b"\xff\xd8\xffFIRST"),
        ("application/json", json.dumps({"engine": "late"}).encode()),
    ])
    df = spark.createDataFrame(
        [(bytearray(body), ctype)], "body binary, content_type string"
    )
    row = requests_from_multipart(df).collect()[0]
    # reference returns at the first image part; the late json is ignored
    assert row["error"] is None
    assert bytes(row["html"]) == b"\xff\xd8\xffFIRST"
    assert row["engine"] is None


def test_multipart_errors_as_values(spark):
    from open_ocr_spark.sources import requests_from_multipart

    good_body, good_ctype = _multipart_body([("image/png", b"x")])
    bad_part_body, bad_part_ctype = _multipart_body([("text/plain", b"nope")])
    rows = [
        (bytearray(b"whatever"), "application/json"),       # not multipart
        (bytearray(bad_part_body), bad_part_ctype),          # wrong part type
        (bytearray(good_body), good_ctype),                  # fine
        (bytearray(_multipart_body([])[0]), good_ctype),     # no parts
    ]
    df = spark.createDataFrame(rows, "body binary, content_type string")
    got = requests_from_multipart(df).collect()
    errs = [r["error"] for r in got]
    assert errs[0] == "Expected multipart related"
    assert errs[1] == "Expected content-type: image/*"
    assert errs[2] is None
    assert errs[3] is not None


# --- url fetch stage (A1, ocr_util.go:35-51) --------------------------------


def test_fetch_data_and_file_urls(spark, tmp_path):
    import base64

    from open_ocr_spark.sources import fetch_url_payloads

    f = tmp_path / "page.html"
    f.write_bytes(b"<html>disk bytes</html>")
    rows = [
        ("data:text/html;base64," + base64.b64encode(b"from-b64").decode(), 1),
        ("data:text/plain,hello%20world", 2),
        (f"file://{f}", 3),
        ("https://example.com/x", 4),
        ("ftp://example.com/x", 5),
        ("data:text/html;base64,!!!notb64!!!", 6),
    ]
    df = spark.createDataFrame(rows, "url string, doc_id long")
    got = {r["doc_id"]: r for r in fetch_url_payloads(df).collect()}
    assert bytes(got[1]["html"]) == b"from-b64" and got[1]["fetch_error"] is None
    assert bytes(got[2]["html"]) == b"hello world"
    assert bytes(got[3]["html"]) == b"<html>disk bytes</html>"
    assert got[4]["html"] is None and "network" in got[4]["fetch_error"]
    assert got[5]["html"] is None and "unsupported" in got[5]["fetch_error"]
    assert got[6]["html"] is None and "bad data url" in got[6]["fetch_error"]
    # passthrough column survives
    assert got[3]["doc_id"] == 3
