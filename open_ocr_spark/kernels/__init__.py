"""Pure-Python vectorized extraction kernels.

No pyspark imports anywhere in this package: every kernel is a plain
function over Python/pandas values so it can be unit-tested without a
SparkSession (SURVEY.md §5.2 tier 1) and shipped to executors via
``--py-files``. The Spark side wraps these in ``mapInArrow`` /
``pandas_udf`` (pipeline/stages.py).
"""

from open_ocr_spark.kernels.mock import MOCK_ENGINE_RESPONSE, mock_extract
from open_ocr_spark.kernels.html_extract import extract_main_text
from open_ocr_spark.kernels.pdf_text import extract_pdf_text, is_pdf
from open_ocr_spark.kernels.dispatch import extract_document

__all__ = [
    "MOCK_ENGINE_RESPONSE",
    "mock_extract",
    "extract_main_text",
    "extract_pdf_text",
    "is_pdf",
    "extract_document",
]
