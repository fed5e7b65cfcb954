"""Metrics tier: the run-manifest aggregations (docs/bytes/failures by
host, lang, crawl day) including the skew-safe two-phase host rollup."""

import pyspark.sql.functions as F

from open_ocr_spark.fixtures import pages_df
from open_ocr_spark.pipeline.job import extraction_plan
from open_ocr_spark.pipeline.metrics import (
    daily_metrics,
    error_class_metrics,
    lang_metrics,
    run_metrics,
)


def test_run_metrics_two_phase_host_agg(spark):
    pages = pages_df(spark, 200)
    extracted = extraction_plan(pages)
    got = run_metrics(extracted).collect()
    hosts = [r["host"] for r in got]
    # Zipf skew from the fixture: the two heavy hosts lead the ranking
    assert hosts[0] == "alpha.example.com"
    assert "beta.example.org" in hosts[:2]
    total_docs = sum(r["docs"] for r in got)
    assert total_docs == extracted.count()
    # failure counts propagate
    assert sum(r["failures"] for r in got) == extracted.filter(
        F.col("status") != "ok"
    ).count()


def test_lang_metrics_column_pruned(spark):
    pages = pages_df(spark, 100)
    got = {r["lang"]: r["docs"] for r in lang_metrics(pages).collect()}
    assert sum(got.values()) == pages.count()
    assert "eng" in got


def test_error_class_metrics_splits_pdf_filters(spark):
    # unsupported-PDF rows must be reported per refused feature, not as one
    # opaque bucket (VERDICT r2 item 7)
    rows = [
        ("u1", "ok", ""),
        ("u2", "error:pdf-unsupported",
         "pdf-unsupported:filter-DCTDecode"),
        ("u3", "error:pdf-unsupported",
         "pdf-unsupported:filter-DCTDecode"),
        ("u4", "error:pdf-unsupported",
         "pdf-unsupported:filter-LZWDecode,FlateDecode"),
        ("u5", "error:pdf-unsupported",
         "pdf-unsupported:no-length: filtered stream without usable /Length"),
        ("u6", "error:lang", "unsupported lang: xx"),
    ]
    df = spark.createDataFrame(rows, "url string, status string, error string")
    got = {r["error_class"]: r["docs"]
           for r in error_class_metrics(df).collect()}
    assert got == {
        "error:pdf-unsupported:filter-DCTDecode": 2,
        "error:pdf-unsupported:filter-LZWDecode,FlateDecode": 1,
        "error:pdf-unsupported:no-length": 1,
        "error:lang": 1,
    }


def test_error_class_metrics_on_real_pipeline(spark):
    # end-to-end: fixture error rows (empty payload, bad lang) come through
    # with their coarse classes; no 'ok' rows appear
    pages = pages_df(spark, 100)
    extracted = extraction_plan(pages)
    got = {r["error_class"]: r["docs"]
           for r in error_class_metrics(extracted).collect()}
    assert all(c.startswith("error:") for c in got)
    assert got.get("error:empty", 0) > 0
    assert got.get("error:lang", 0) > 0


def test_daily_metrics(spark):
    pages = pages_df(spark, 100)
    got = daily_metrics(pages).collect()
    assert sum(r["docs"] for r in got) == pages.count()
    # fixture re-crawls are +30 days: at least two crawl days exist
    assert len(got) >= 2
