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


def fetch_url_payloads(requests: DataFrame, url_col: str = "url") -> DataFrame:
    """A1: the reference's fetch-by-url source (url2bytes,
    /root/reference/ocr_util.go:35-51) as a batch stage. Supported
    schemes, resolved inside an Arrow-batched kernel on the executor that
    owns the row:

    - ``data:`` URLs (RFC 2397): payload decoded in-process (base64 or
      percent-encoding) — the self-contained form a test corpus uses;
    - ``file://`` URLs: read from executor-local storage (the batch analog
      of a crawl fetch against a mounted store);
    - ``http(s)://``: error-as-value here — this sandbox has no network,
      and a 10^12-doc pipeline fetches via the crawl layer, not from
      executors mid-query. The row carries fetch_error instead of bytes,
      mirroring how the reference surfaces download failures
      (ocr_rpc_worker.go:163-190).

    Output: every input column (passthrough) + html binary + fetch_error."""
    from typing import Iterator

    import pandas as pd

    cols = [c for c in requests.columns if c not in ("html", "fetch_error")]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in requests.schema.fields
        if f.name in cols
    ) + ", html binary, fetch_error string"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import base64 as b64
        import binascii
        import urllib.parse

        def fetch(url):
            if url is None:
                return None, "empty url"
            if url.startswith("data:"):
                try:
                    meta, _, payload = url[5:].partition(",")
                    if meta.endswith(";base64"):
                        # RFC 2045 allows line breaks in base64 (Spark's
                        # base64() emits 76-char MIME chunking)
                        compact = "".join(payload.split())
                        return b64.b64decode(compact, validate=True), None
                    return urllib.parse.unquote_to_bytes(payload), None
                except (ValueError, binascii.Error) as exc:
                    return None, f"bad data url: {exc}"
            if url.startswith("file://"):
                path = urllib.parse.urlparse(url).path
                try:
                    with open(path, "rb") as f:
                        return f.read(), None
                except OSError as exc:
                    return None, f"fetch failed: {exc}"
            if url.startswith(("http://", "https://")):
                return None, "network fetch not available in batch stage"
            return None, f"unsupported url scheme: {url.split(':', 1)[0]}"

        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            fetched = [fetch(u) for u in pdf[url_col]]
            yield pdf.assign(
                html=pd.Series([p for p, _ in fetched], dtype=object),
                fetch_error=pd.Series([e for _, e in fetched], dtype=object),
            )

    return requests.select(*cols).mapInPandas(kernel, schema)


MULTIPART_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "engine string, preprocessors array<string>, "
    "preprocessor_args map<string,string>, engine_args_json string, "
    "inplace_decode boolean, error string"
)


def _parse_multipart_request(body: bytes, content_type: str):
    """One multipart/related request body → OcrRequest-shaped dict, with
    the reference's exact part semantics
    (/root/reference/ocr_http_multipart_handler.go:26-88): an
    application/json part fills the request fields; the FIRST image/* part
    becomes the payload and ends parsing (json arriving after the image is
    ignored, as in the reference); any other part type is an error, as is
    a non-multipart/related content type. Errors come back as values."""
    import email.parser
    import email.policy
    import json as _json

    if not (content_type or "").strip().lower().startswith("multipart/related"):
        return None, "Expected multipart related"
    msg = email.parser.BytesParser(policy=email.policy.default).parsebytes(
        b"Content-Type: " + content_type.encode("ascii", "replace")
        + b"\r\nMIME-Version: 1.0\r\n\r\n" + bytes(body)
    )
    if not msg.is_multipart():
        return None, "Expected multipart related"
    req: dict = {}
    for part in msg.iter_parts():
        ptype = part.get_content_type()
        if ptype == "application/json":
            try:
                req.update(_json.loads(part.get_payload(decode=True)))
            except (ValueError, TypeError) as exc:
                return None, f"Unable to unmarshal json: {exc}"
        elif ptype.startswith("image"):
            req["_img_bytes"] = part.get_payload(decode=True)
            return req, None
        else:
            return None, "Expected content-type: image/*"
    return None, "no image part in multipart body"


def requests_from_multipart(
    requests: DataFrame,
    body_col: str = "body",
    content_type_col: str = "content_type",
) -> DataFrame:
    """A4: the multipart/related upload surface as batch ingestion — one
    request body per row, parsed with the stdlib MIME parser inside an
    Arrow-batched kernel (ingestion-boundary Python, like the reference's
    handler; the extraction hot path stays JVM-side). Output shape matches
    requests_from_json plus an ``error`` column (error-as-value)."""
    from typing import Iterator

    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json as _json

        cols = [
            "url", "warc_ts", "html", "text", "lang", "engine",
            "preprocessors", "preprocessor_args", "engine_args_json",
            "inplace_decode", "error",
        ]
        for pdf in batches:
            rows = []
            for body, ctype in zip(pdf[body_col], pdf[content_type_col]):
                req, err = _parse_multipart_request(
                    bytes(body) if body is not None else b"", ctype or ""
                )
                if err is not None:
                    rows.append((None, None, None, None, None, None, None,
                                 None, None, None, err))
                    continue
                ea = req.get("engine_args")
                rows.append((
                    req.get("img_url"),
                    None,
                    req.get("_img_bytes"),
                    None,
                    (ea or {}).get("lang"),
                    req.get("engine"),
                    req.get("preprocessors"),
                    req.get("preprocessor-args"),
                    _json.dumps(ea, sort_keys=True) if ea is not None else None,
                    req.get("inplace_decode"),
                    None,
                ))
            yield pd.DataFrame(rows, columns=cols)

    return requests.select(body_col, content_type_col).mapInPandas(
        kernel, MULTIPART_SCHEMA
    )


def requests_from_json(
    requests: DataFrame,
    json_col: str = "request",
    ingest_ts: str = "2024-01-01 00:00:00",
) -> DataFrame:
    """Parse a column of OcrRequest JSON bodies into the pipeline's input
    shape. Mirrors the reference's decode + materialize steps
    (ocr_http_handler.go:26-33 JSON decode; ocr_rpc_client.go:89-109
    source-priority resolve): img_base64 decodes via unbase64; img_url
    remains the identity key (no network fetch at runtime — A1 is
    ingest-only). engine_args keeps the reference's nested shape and is
    re-encoded as JSON for the kernel (`engine_args_json`).

    ``ingest_ts`` stamps warc_ts with a caller-controlled CONSTANT (a real
    ingest passes its batch's crawl time); the default is a fixed epoch,
    never current_timestamp(), so two runs of the same ingest produce
    byte-identical frames (SURVEY §7.3 determinism invariant)."""
    parsed = requests.withColumn(
        "_req", F.from_json(F.col(json_col), REQUEST_JSON_SCHEMA)
    )
    return parsed.select(
        F.col("_req.img_url").alias("url"),
        F.to_timestamp(F.lit(ingest_ts)).alias("warc_ts"),
        F.unbase64(F.col("_req.img_base64")).alias("html"),  # A2/A5 coalesce
        F.lit(None).cast("string").alias("text"),
        F.col("_req.engine_args.lang").alias("lang"),
        F.col("_req.engine").alias("engine"),
        F.col("_req.preprocessors").alias("preprocessors"),
        F.col("_req.`preprocessor-args`").alias("preprocessor_args"),
        F.to_json(F.col("_req.engine_args")).alias("engine_args_json"),
        F.col("_req.inplace_decode").alias("inplace_decode"),
    )
