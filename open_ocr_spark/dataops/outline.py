"""Heading outline: section paths from h1-h6 structure.

Structure-aware chunking (RAG-style "attach the section trail to every
chunk") and document-map features need, for each heading, the trail of
its ancestor headings — ``Doc > Setup > Install``. The HTML heading
model is flat (a sequence of levels, not a tree), so the trail of a
heading at level L is, for each level l < L, the MOST RECENT preceding
heading of level l: exactly a running ``last(..., ignorenulls)`` window
per level — no tree build, no Python.

Scale: one regexp extraction + posexplode, then one window per level
over the SAME (url, idx) ordering — Spark plans all of them in a single
WindowExec after one exchange on url (uniform key). Levels beyond h3
carry almost no real-world outline signal and each adds a window
column; h1-h3 is the implemented contract (documented cap, not a todo).

Regex note: headings are matched level-by-level (``<h2>...</h2>``)
rather than with a backreferenced ``</h\\1>`` because the DuckDB oracle
dialect (RE2) has no backreferences — same cross-dialect discipline as
dataops/sentences.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LEVELS = (1, 2, 3)


def heading_outline(pages: DataFrame, html_col: str = "html_str",
                    url_col: str = "url") -> DataFrame:
    """(url, heading_idx, level, title, path): one row per h1-h3 in
    document order; ``path`` joins the latest preceding h1/h2 ancestors
    (levels above the heading's own) with ' > ' and ends in the
    heading's own title. Missing ancestors are skipped, not blanked."""
    levels = F.regexp_extract_all(
        F.col(html_col), F.lit("<h([1-3])>[^<]*</h"), 1
    )
    titles = F.regexp_extract_all(
        F.col(html_col), F.lit("<h[1-3]>([^<]*)</h"), 1
    )
    pairs = F.arrays_zip(levels.alias("level"), titles.alias("title"))
    flat = (
        pages.select(url_col, F.posexplode(pairs).alias("heading_idx", "p"))
        .select(
            url_col,
            "heading_idx",
            F.col("p.level").cast("int").alias("level"),
            F.col("p.title").alias("title"),
        )
    )
    w = (
        Window.partitionBy(url_col)
        .orderBy("heading_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    anc = {
        lv: F.last(
            F.when(F.col("level") == lv, F.col("title")), ignorenulls=True
        ).over(w)
        for lv in _LEVELS[:-1]
    }
    anc_idx = {
        lv: F.last(
            F.when(F.col("level") == lv, F.col("heading_idx")),
            ignorenulls=True,
        ).over(w)
        for lv in _LEVELS[:-1]
    }
    # an h2 ancestor is only on the trail if it appeared AFTER the h1
    # ancestor — an h3 directly under a fresh h1 must not inherit the
    # previous section's stale h2
    h2_fresh = anc_idx[2] > F.coalesce(anc_idx[1], F.lit(-1))
    path = F.concat_ws(
        " > ",
        F.when(F.col("level") > 1, anc[1]),
        F.when((F.col("level") > 2) & h2_fresh, anc[2]),
        F.col("title"),
    )
    return flat.select(url_col, "heading_idx", "level", "title",
                       path.alias("path"))
