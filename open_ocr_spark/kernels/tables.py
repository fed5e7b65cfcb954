"""HTML table extraction: structured (table, row, cell) records from
the same parsed node tree the boilerplate-strip extractor uses
(kernels/htmltree.parse_html — reference parity: the SWT preprocessor
chain in tleyden/open-ocr feeds page regions to the engine; tables are
the page regions whose STRUCTURE is the payload, so they get their own
extraction surface instead of being flattened into running text).

Contract:
- every <table> element in document order is one table (nested tables
  are emitted as their own tables too);
- rows are the <tr> descendants reached without crossing into a nested
  table, cells the <td>/<th> descendants of a row under the same rule;
- cell text is every text run under the cell (nested-table text
  included — the nested structure is ALSO emitted separately),
  whitespace-collapsed, entities already decoded by the parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from open_ocr_spark.kernels.htmltree import Node, collapse_ws, parse_html


def _descendants(node: Node, want: set, out: list) -> None:
    """want-tagged descendants reachable without entering a nested
    table."""
    for c in node.children:
        if type(c) is str:
            continue
        if c.tag in want:
            out.append(c)
        elif c.tag != "table":
            _descendants(c, want, out)


def _cell_text(cell: Node) -> str:
    return collapse_ws(" ".join(cell.iter_text())).strip()


def extract_tables(raw) -> list:
    """[(table_idx, row_idx, col_idx, cell_text)] for every table in
    the page, document order throughout."""
    root = parse_html(raw)
    tables = [n for n in root.iter() if type(n) is not str and n.tag == "table"]
    out = []
    for t_idx, table in enumerate(tables):
        rows: list = []
        _descendants(table, {"tr"}, rows)
        for r_idx, row in enumerate(rows):
            cells: list = []
            _descendants(row, {"td", "th"}, cells)
            for c_idx, cell in enumerate(cells):
                out.append((t_idx, r_idx, c_idx, _cell_text(cell)))
    return out


def html_tables(
    pages: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, table_idx, row_idx, col_idx, cell): exploded structured
    table records — Arrow-batched kernel, one output row per cell, no
    shuffle (pure mapInPandas over the page partition)."""
    import pandas as pd

    def _extract(batches):
        for pdf in batches:
            ids, tis, ris, cis, cells = [], [], [], [], []
            for i, raw in zip(pdf[id_col], pdf[html_col]):
                if raw is None:
                    continue
                for ti, ri, ci, cell in extract_tables(bytes(raw)):
                    ids.append(int(i))
                    tis.append(ti)
                    ris.append(ri)
                    cis.append(ci)
                    cells.append(cell)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "table_idx": pd.Series(tis, dtype="int64"),
                    "row_idx": pd.Series(ris, dtype="int64"),
                    "col_idx": pd.Series(cis, dtype="int64"),
                    "cell": pd.Series(cells, dtype="object"),
                }
            )

    return pages.mapInPandas(
        _extract,
        f"{id_col} long, table_idx long, row_idx long, col_idx long,"
        " cell string",
    )
