"""HTTP redirect-chain resolution by pointer doubling.

A crawl's capture table is full of 3xx rows; dedup, frontier accounting
and canonical-URL assignment all need each URL's FINAL target — but a
chain a->b->c->d resolved one hop per pass costs a pass per hop.  This
resolves every chain in ceil(log2(max_hops)) self-joins via pointer
doubling (the parallel pointer-jumping of Wyllie's list ranking; the
same doubling Kiveris SoCC'14 uses for connected components): after k
rounds each row points min(2^k, dist-to-terminal) steps ahead.

Frozen contract (engine-exact, oracle-checkable closed-form):

- an edge exists for status 301/302/303/307/308 with a Location value,
  RESOLVED against the capture URL per RFC 3986 (Location is routinely
  relative; dataops/resolveurl.py);
- ``final_url``  = the node reached after following
  min(dist-to-terminal, max_hops) edges (max_hops rounds to the next
  power of two); a target OUTSIDE the capture set is terminal
  (dangling — the crawl never fetched it);
- ``hops``       = edges actually followed (so a loop shows exactly
  max_hops);
- ``looped``     = the row STILL SITS ON A REDIRECT after max_hops
  edges — redirect cycles and over-deep chains, the rows a crawler
  refuses.  (A chain of length exactly max_hops lands on its terminal
  and is NOT looped: a final "peek" join checks the landing row's own
  status, because the doubling's done-flag alone cannot distinguish
  dist == max_hops from dist > max_hops.)

Scale shape: K = log2(max_hops) shuffle equi-joins of the capture table
with itself on the target key (plus the one peek join) — chain length
never enters the pass count, exactly the diameter-independence argument
of dataops/clusters.py.  No Python, no collect, no
iteration-to-fixpoint.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_ocr_spark.dataops.resolveurl import resolve_url

_REDIRECT_STATUSES = (301, 302, 303, 307, 308)


def resolve_redirect_chains(
    captures: DataFrame,
    max_hops: int = 8,
    url_col: str = "url",
    status_col: str = "status",
    location_col: str = "location",
) -> DataFrame:
    """(url, final_url, hops, looped) for every capture row (module
    header for the frozen contract)."""
    k = max(1, math.ceil(math.log2(max_hops)))
    is_redirect = F.col(status_col).isin(list(_REDIRECT_STATUSES)) & F.col(
        location_col
    ).isNotNull()
    state = captures.select(
        F.col(url_col).alias("url"),
        F.when(
            is_redirect, resolve_url(F.col(url_col), F.col(location_col))
        )
        .otherwise(F.col(url_col))
        .alias("target"),
        F.when(is_redirect, F.lit(1)).otherwise(F.lit(0))
        .cast("long")
        .alias("hops"),
        (~is_redirect).alias("done"),
    )
    for _ in range(k):
        # PIN each round: the doubling joins the state with ITSELF, so an
        # unpinned plan tree doubles per round — O(2^K) recomputation of
        # the whole lineage (the same multi-consumer-subtree trap
        # dataops/dedup.py:142 documents).  An eager localCheckpoint per
        # round keeps the executed work at K passes over a table the size
        # of the capture set.
        state = state.localCheckpoint(eager=True)
        nxt = state.select(
            F.col("url").alias("t_url"),
            F.col("target").alias("t_target"),
            F.col("hops").alias("t_hops"),
            F.col("done").alias("t_done"),
        )
        state = (
            state.join(nxt, state["target"] == nxt["t_url"], "left")
            .select(
                "url",
                F.when(
                    F.col("done") | F.col("t_url").isNull(),
                    F.col("target"),
                )
                .otherwise(F.col("t_target"))
                .alias("target"),
                F.when(
                    F.col("done") | F.col("t_url").isNull(),
                    F.col("hops"),
                )
                .otherwise(F.col("hops") + F.col("t_hops"))
                .alias("hops"),
                (
                    F.col("done")
                    | F.col("t_url").isNull()  # dangling: terminal
                    | F.col("t_done")
                ).alias("done"),
            )
        )
    # peek: a not-done row whose landing node is a non-redirect (or is
    # outside the capture set) completed its chain in exactly max_hops
    # edges — terminal, not looped.
    landing = captures.select(
        F.col(url_col).alias("l_url"),
        (
            F.col(status_col).isin(list(_REDIRECT_STATUSES))
            & F.col(location_col).isNotNull()
        ).alias("l_redirect"),
    )
    return (
        state.join(landing, state["target"] == landing["l_url"], "left")
        .select(
            "url",
            F.col("target").alias("final_url"),
            "hops",
            (
                ~F.col("done") & F.coalesce("l_redirect", F.lit(False))
            ).alias("looped"),
        )
    )
