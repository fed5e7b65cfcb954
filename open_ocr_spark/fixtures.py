"""Deterministic synthetic `pages` + `golden_extracted` fixtures (seed=42).

Schema is exactly BASELINE.json `input_hint`:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string
plus optional request-option columns (engine, engine_args, preprocessors,
preprocessor_args) mirroring the reference's OcrRequest surface
(/root/reference/ocr_request.go:6-17).

Goldens are computed from the GENERATOR's knowledge of the embedded main
content — NOT by running the extraction kernel — so the byte-identical test
is a real oracle (FIXTURES.md §2). One golden row reuses the reference's
README transcript paragraph verbatim (/root/reference/README.md:135-138).

Hosts are Zipf-skewed (2 hosts ≈ 50% of rows) to exercise salting; ~10% of
urls appear twice with different warc_ts to exercise the latest-per-url
window dedupe (FIXTURES.md §1).
"""

from __future__ import annotations

import datetime as dt
import html as _html
import random

from open_ocr_spark.kernels.mock import MOCK_ENGINE_RESPONSE

SEED = 42

# Verbatim golden paragraph from the reference's own docs transcript
# (/root/reference/README.md:135-138) — the de-facto golden of its e2e flow.
README_GOLDEN = (
    "You can create local variables for the pipelines within the template by "
    "prefixing the variable name with a “$” sign. Variable names have "
    "to be composed of alphanumeric characters and the underscore. In the "
    "example below I have used a few variations that work for variable names."
)

_WORDS = (
    "data spark table query batch stream window filter join merge sort key "
    "value row column vector hash scan agg group order line part customer "
    "fast slow big small the a"
).split()

_HOSTS = (
    # Zipf-ish: first two hosts get ~50% of documents
    ["alpha.example.com"] * 30
    + ["beta.example.org"] * 20
    + [f"site{i:02d}.example.net" for i in range(18)]
)

_LANGS = ["eng", "jpn", "deu", "fra", "spa", "chi-sim", "rus", "ita"]
_BAD_LANGS = ["xx", "klingon"]  # outside the apiary enum → lang-gate errors

_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _paragraph(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _page_html(rng: random.Random, paragraphs: list[str], title: str) -> bytes:
    """Boilerplate nav/footer/link-farm wrapping known main content."""
    nav_links = "".join(
        f'<li><a href="/s/{i}">Section {i}</a></li>' for i in range(rng.randint(4, 9))
    )
    farm = " ".join(
        f'<a href="/t/{i}">tag{i}</a>' for i in range(rng.randint(6, 14))
    )
    body_paras = "".join(f"<p>{_html.escape(p)}</p>" for p in paragraphs)
    sidebar = "".join(
        f'<li><a href="/r/{i}">related {i}</a></li>' for i in range(rng.randint(3, 8))
    )
    return (
        "<html><head><title>"
        + title
        + '</title><script>window.q=[];</script><style>.x{color:red}</style></head>'
        + "<body>"
        + f"<header><h1>{title}</h1><nav><ul>{nav_links}</ul></nav></header>"
        + f'<div class="content"><article>{body_paras}</article>'
        + f"<aside><ul>{sidebar}</ul></aside></div>"
        + f'<footer>{farm}<p>© 2024 example</p></footer>'
        + "</body></html>"
    ).encode("utf-8")


def _page_pdf(lines: list[str]) -> bytes:
    """Minimal uncompressed PDF with one Tj text-show per line."""
    shows = "\n".join(
        "BT (" + ln.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        + ") Tj ET"
        for ln in lines
    )
    return (
        "%PDF-1.4\n1 0 obj\n<< /Length 0 >>\nstream\n"
        + shows
        + "\nendstream\nendobj\ntrailer\n%%EOF\n"
    ).encode("utf-8")


def generate_pages(n_rows: int = 500, seed: int = SEED):
    """Return (pages_rows, golden_rows) as lists of dicts.

    pages:  url, warc_ts, html, text, lang, engine, preprocessors,
            preprocessor_args
    golden: url, extracted_text, status
    """
    rng = random.Random(seed)
    pages: list[dict] = []
    golden: list[dict] = []

    for i in range(n_rows):
        host = _HOSTS[rng.randrange(len(_HOSTS))]
        url = f"https://{host}/doc/{i}"
        ts = _EPOCH + dt.timedelta(seconds=i * 97)
        kind = i % 20  # deterministic case mix

        lang = _LANGS[i % len(_LANGS)]
        engine = "tesseract"
        preprocessors = None
        preprocessor_args = None

        if kind == 17:
            # mock-engine rows assert the literal constant
            paragraphs = [_paragraph(rng, 12)]
            html = _page_html(rng, paragraphs, f"Doc {i}")
            engine = "mock"
            expected, status = MOCK_ENGINE_RESPONSE, "ok"
        elif kind == 18:
            # unknown engine string → defaults to mock (ocr_engine.go:58-60)
            paragraphs = [_paragraph(rng, 10)]
            html = _page_html(rng, paragraphs, f"Doc {i}")
            engine = f"unknown-{i}"
            expected, status = MOCK_ENGINE_RESPONSE, "ok"
        elif kind == 15:
            # PDF payload routed by magic bytes
            lines = [_paragraph(rng, 8) for _ in range(3)]
            html = _page_pdf(lines)
            preprocessors = ["convert-pdf", "stroke-width-transform"]
            expected, status = "\n".join(lines), "ok"
        elif kind == 16:
            # empty payload → error-as-value
            html = b""
            expected, status = "", "error:empty"
        elif kind == 19:
            # bad lang outside the enum → lang gate error
            paragraphs = [_paragraph(rng, 10)]
            html = _page_html(rng, paragraphs, f"Doc {i}")
            lang = _BAD_LANGS[i % len(_BAD_LANGS)]
            expected, status = "", "error:lang"
        elif kind == 14:
            # non-UTF8 bytes inside otherwise-valid HTML: frozen decode
            # policy is utf-8/replace, so \xff becomes U+FFFD
            para = _paragraph(rng, 9)
            html = (
                b"<html><body><article><p>"
                + para.encode("utf-8")
                + b" \xff\xfe tail</p></article></body></html>"
            )
            expected, status = para + " �� tail", "ok"
        elif kind == 13 and i == 13:
            # the reference's README golden paragraph, verbatim
            html = _page_html(rng, [README_GOLDEN], "Golden transcript")
            expected, status = README_GOLDEN, "ok"
        elif kind == 12:
            # CJK main content: no-whitespace text must survive untouched
            paras = [
                "这是一段中文正文内容没有空格也必须逐字节保留第" + str(i) + "段",
                "第二段中文内容包含标点。还有，逗号！",
            ]
            nav = '<nav><ul><li><a href="/">首页</a></li><li><a href="/a">关于</a></li></ul></nav>'
            html = (
                "<html><body>" + nav + "<article>"
                + "".join(f"<p>{p}</p>" for p in paras)
                + '</article><footer><a href="/x">链接</a></footer></body></html>'
            ).encode("utf-8")
            expected, status = "\n\n".join(paras), "ok"
        elif kind == 11:
            # table-based layout: the content <td> must beat the link cell
            cell = _paragraph(rng, 30 + i % 10)
            links = " ".join(f'<a href="/l/{j}">link {j}</a>' for j in range(8))
            html = (
                "<html><body><header><h1>T</h1></header><table><tr>"
                + f'<td class="m">{_html.escape(cell)}</td><td>{links}</td>'
                + "</tr></table><footer>(c)</footer></body></html>"
            ).encode("utf-8")
            expected, status = cell, "ok"
        elif kind == 10:
            # list-structured main content: one paragraph per <li>
            items = [_paragraph(rng, 9 + j) for j in range(4)]
            nav = "".join(f'<li><a href="/n/{j}">nav {j}</a></li>' for j in range(6))
            html = (
                f"<html><body><nav><ul>{nav}</ul></nav><article><ul>"
                + "".join(f"<li>{_html.escape(x)}</li>" for x in items)
                + '</ul></article><footer><a href="/f">f</a></footer></body></html>'
            ).encode("utf-8")
            expected, status = "\n\n".join(items), "ok"
        elif kind == 9:
            # entity-rich content: escapes must round-trip byte-exactly
            para = (
                _paragraph(rng, 6)
                + ' fish & chips <cheap> "quoted" 100% '
                + _paragraph(rng, 6)
            )
            html = _page_html(rng, [para], f"Doc {i}")
            expected, status = para, "ok"
        elif kind == 8:
            # RFC 5322 / MIME e-mail payload (r5): rotating wire variant
            from open_ocr_spark.kernels.eml_text import build_eml

            subj = f"Fixture mail {i % 7}"
            mail_body = _paragraph(rng, 10) + "\nsecond line."
            html = build_eml(subj, mail_body, variant=i % 4)
            expected, status = f"{subj}\n\n{mail_body}\n", "ok"
        elif kind == 7:
            # corpus.tar.gz payload (r5): gzip transparency + tar members
            import gzip as _gzip

            from open_ocr_spark.kernels.archive import build_tar

            inner = _paragraph(rng, 9)
            plain = _paragraph(rng, 7)
            html = _gzip.compress(
                build_tar([
                    ("a.html",
                     f"<html><body><p>{_html.escape(inner)}</p></body>"
                     "</html>".encode()),
                    ("b.txt", plain.encode()),
                ]),
                mtime=0,
            )
            expected, status = f"{inner}\n{plain}", "ok"
        elif kind == 6:
            # generic zip payload (r5): non-Office PK container
            from open_ocr_spark.kernels.archive import build_zip

            inner = _paragraph(rng, 8)
            plain = _paragraph(rng, 6)
            html = build_zip([
                ("p.html",
                 f"<html><body><p>{_html.escape(inner)}</p></body>"
                 "</html>".encode()),
                ("n.txt", plain.encode()),
            ])
            expected, status = f"{inner}\n{plain}", "ok"
        elif kind == 5:
            # Jupyter notebook payload (r5): cell sources + stream output
            from open_ocr_spark.kernels.ipynb_text import build_ipynb

            prose = _paragraph(rng, 9)
            html = build_ipynb(
                [("markdown", prose), ("code", f"y = {i}\nprint(y)")],
                outputs={1: [{"output_type": "stream", "name": "stdout",
                              "text": [f"{i}\n"]}]},
            )
            expected = f"{prose}\n\ny = {i}\nprint(y)\n\n{i}"
            status = "ok"
        elif kind == 1:
            # PostScript payload (r5): moveto/show lines + escaped parens
            from open_ocr_spark.kernels.ps_text import build_ps

            l1 = _paragraph(rng, 6) + " (quoted)."
            l2 = _paragraph(rng, 5)
            html = build_ps([[l1, l2]])
            expected, status = f"{l1}\n{l2}", "ok"
        elif kind == 2:
            # subtitle payload (r5): SRT and WebVTT alternate by row.
            # NOT kind 3/13: i % 10 == 3 rows are re-crawled below and
            # their goldens replaced by the v2 HTML snapshot
            from open_ocr_spark.kernels.subtitle_text import (
                build_srt,
                build_webvtt,
            )

            line = _paragraph(rng, 7)
            if (i % 40) == 2:
                html = build_srt([(0, 900, f"Cue {i}."), (1000, 1900, line)])
            else:
                html = build_webvtt(
                    [(0, 900, f"Cue {i}."), (1000, 1900, line)],
                    note="fixture",
                )
            expected, status = f"Cue {i}.\n\n{line}", "ok"
        elif kind == 4:
            # LaTeX payload (r5): preamble + comments + section + ligature
            from open_ocr_spark.kernels.latex_text import build_latex

            para = _paragraph(rng, 10) + " --- done."
            html = build_latex([para], title=f"Fixture {i % 11}")
            expected = (f"Fixture {i % 11}\n\n"
                        + para[:-len(" --- done.")] + " — done.")
            status = "ok"
        else:
            n_paras = 2 + (i % 4)
            paragraphs = [_paragraph(rng, 8 + (i + j) % 30) for j in range(n_paras)]
            html = _page_html(rng, paragraphs, f"Doc {i}")
            expected, status = "\n\n".join(paragraphs), "ok"

        visible_text = expected if status == "ok" else ""
        pages.append(
            dict(
                url=url,
                warc_ts=ts,
                html=html,
                text=visible_text,
                lang=lang,
                engine=engine,
                preprocessors=preprocessors,
                preprocessor_args=preprocessor_args,
            )
        )
        golden.append(dict(url=url, extracted_text=expected, status=status))

        # ~10% of urls re-crawled with a NEWER warc_ts and different
        # content: the dedupe window must keep the newer row, so the golden
        # reflects the re-crawl.
        if i % 10 == 3 and status == "ok" and engine == "tesseract":
            paragraphs2 = [_paragraph(rng, 11), _paragraph(rng, 17)]
            html2 = (
                _page_pdf([p for p in paragraphs2])
                if kind == 15
                else _page_html(rng, paragraphs2, f"Doc {i} v2")
            )
            expected2 = (
                "\n".join(paragraphs2) if kind == 15 else "\n\n".join(paragraphs2)
            )
            pages.append(
                dict(
                    url=url,
                    warc_ts=ts + dt.timedelta(days=30),
                    html=html2,
                    text=expected2,
                    lang=lang,
                    engine=engine,
                    preprocessors=preprocessors,
                    preprocessor_args=preprocessor_args,
                )
            )
            golden[-1] = dict(url=url, extracted_text=expected2, status="ok")

    return pages, golden


# --- Spark-side loaders ----------------------------------------------------

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "engine string, preprocessors array<string>, "
    "preprocessor_args map<string,string>"
)
GOLDEN_DDL = "url string, extracted_text string, status string"


def pages_df(spark, n_rows: int = 500, seed: int = SEED):
    """Materialize the fixture as a DataFrame (deterministic)."""
    pages, _ = generate_pages(n_rows, seed)
    rows = [
        (
            p["url"], p["warc_ts"], p["html"], p["text"], p["lang"],
            p["engine"], p["preprocessors"], p["preprocessor_args"],
        )
        for p in pages
    ]
    return spark.createDataFrame(rows, schema=PAGES_DDL)


def golden_df(spark, n_rows: int = 500, seed: int = SEED):
    _, golden = generate_pages(n_rows, seed)
    rows = [(g["url"], g["extracted_text"], g["status"]) for g in golden]
    return spark.createDataFrame(rows, schema=GOLDEN_DDL)
