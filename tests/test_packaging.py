"""Packaging tier (north_star: 'Packaged for spark-submit --py-files'):
zip the package, run the REAL spark-submit with --py-files from a clean
cwd with no PYTHONPATH, and validate the job output with DuckDB as an
independent reader."""

import json
import os
import subprocess
import zipfile
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent


def test_spark_submit_py_files_packaging(spark, tmp_path):
    from open_ocr_spark.fixtures import generate_pages, pages_df

    n = 120
    in_path = str(tmp_path / "pages")
    out_path = str(tmp_path / "out")
    pages_df(spark, n).write.parquet(in_path)

    zpath = tmp_path / "openocrspark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted((REPO / "open_ocr_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--py-files", str(zpath),
            str(REPO / "open_ocr_spark" / "cli.py"),
            "--input", in_path,
            "--output", out_path,
            "--num-buckets", "4",
            "--shuffle-partitions", "4",
        ],
        cwd=str(tmp_path),  # NOT the repo: only the zip provides the package
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["buckets_processed"] == 4

    _, golden = generate_pages(n)
    got = set(
        duckdb.sql(
            "select url, extracted_text, status from "
            f"read_parquet('{out_path}/data/*/*.parquet')"
        ).fetchall()
    )
    assert got == {(g["url"], g["extracted_text"], g["status"]) for g in golden}
