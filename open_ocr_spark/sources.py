"""Source connectors: every input surface the reference accepts, recast as
table ingestion.

- pages_from_binary_files: raw files on disk → pages rows (the A1/A3
  fetch-by-url + raw-bytes sources; `spark.read.format("binaryFile")` is
  the batch analog of open-ocr's url2bytes download,
  /root/reference/ocr_util.go:35-51 — the crawl already fetched).
- requests_from_json: the reference's HTTP JSON request surface
  (/root/reference/ocr_request.go:6-17 field names VERBATIM: img_url,
  img_base64, engine, preprocessors, preprocessor-args, engine_args,
  inplace_decode) parsed with F.from_json into option columns + payload,
  source-priority coalesce applied (A5). This is §3.1 steps 1-4 as one
  projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the OcrRequest JSON schema, keys as in ocr_request.go:6-17
REQUEST_JSON_SCHEMA = (
    "img_url string, img_base64 string, engine string, "
    "preprocessors array<string>, `preprocessor-args` map<string,string>, "
    "engine_args struct<config_vars:map<string,string>, psm:string, lang:string>, "
    "inplace_decode boolean"
)


def pages_from_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Read raw document files into the pages schema: path → url,
    modificationTime → warc_ts, content → html. Column-pruned binaryFile
    scan; lang unknown at this layer."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path)
    return files.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def requests_from_json(requests: DataFrame, json_col: str = "request") -> DataFrame:
    """Parse a column of OcrRequest JSON bodies into the pipeline's input
    shape. Mirrors the reference's decode + materialize steps
    (ocr_http_handler.go:26-33 JSON decode; ocr_rpc_client.go:89-109
    source-priority resolve): img_base64 decodes via unbase64; img_url
    remains the identity key (no network fetch at runtime — A1 is
    ingest-only). engine_args keeps the reference's nested shape and is
    re-encoded as JSON for the kernel (`engine_args_json`)."""
    parsed = requests.withColumn(
        "_req", F.from_json(F.col(json_col), REQUEST_JSON_SCHEMA)
    )
    return parsed.select(
        F.col("_req.img_url").alias("url"),
        F.current_timestamp().alias("warc_ts"),
        F.unbase64(F.col("_req.img_base64")).alias("html"),  # A2/A5 coalesce
        F.lit(None).cast("string").alias("text"),
        F.col("_req.engine_args.lang").alias("lang"),
        F.col("_req.engine").alias("engine"),
        F.col("_req.preprocessors").alias("preprocessors"),
        F.col("_req.`preprocessor-args`").alias("preprocessor_args"),
        F.to_json(F.col("_req.engine_args")).alias("engine_args_json"),
        F.col("_req.inplace_decode").alias("inplace_decode"),
    )
