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


def test_json_request_lang_gate(spark):
    b64 = base64.b64encode(HTML).decode()
    df = spark.createDataFrame(
        [_req(img_url="http://x/9", img_base64=b64,
              engine_args={"lang": "klingon"})],
        "request string",
    )
    got = extract_stage(requests_from_json(df)).collect()[0]
    assert got["status"] == "error:lang"
