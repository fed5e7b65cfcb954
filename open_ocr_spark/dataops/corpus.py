"""End-to-end training-corpus preparation: the composition a data pipeline
actually runs — exact dedup → quality gate → PII scrub → deterministic
split — as ONE declarative plan (Catalyst fuses the per-row stages; the
only shuffle is the dedup's content-hash aggregate + its semi-join back).

Every stage is individually oracle-checked elsewhere (exact_dedup_groups,
quality_scores, pii_scrub, train_test_split); this operator pins the
COMPOSITION, where stage-ordering bugs live (e.g. scoring quality after
scrubbing would shift token counts; splitting before dedup would leak
near-identical docs across train/test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_ocr_spark.dataops.dedup import exact_dedup
from open_ocr_spark.dataops.textstats import scrub_pii, with_quality_score


def prepare_corpus(
    docs: DataFrame, min_quality: float = 0.3
) -> DataFrame:
    """(doc_id, split, n_tokens, quality_score, text) for the cleaned
    corpus: one representative per distinct content (min doc_id), quality
    gate applied to the ORIGINAL text, PII scrubbed after gating (so the
    gate sees true counts), split assigned by content-independent md5 of the
    surviving doc_id — reproducible on any engine, at any parallelism,
    forever.

    Stage ORDER inside the plan: score → dedup → gate → scrub. The quality
    score is a pure function of text, so the gate commutes with exact
    dedup EXACTLY (every copy of a content scores the same ⇒ whole content
    groups survive or drop together, leaving the min-doc_id representative
    unchanged). Putting the dedup WINDOW between the scoring projection
    and the gate makes the window an optimization barrier: the filter
    references quality_score as a materialized window-stage attribute,
    so PushDownPredicates cannot substitute the regex-heavy quality
    expression tree into the filter / scan. With the gate directly above
    the scoring projection instead, that substitution re-evaluated the
    tree in the Filter AND the parquet DataFilters — measured 72 s vs
    26 s for the identical result at 1M docs. The gate's selectivity is
    low (most real docs pass 0.3), so gating after the exchange costs
    almost no extra shuffle volume."""
    scored = with_quality_score(docs)
    deduped = exact_dedup(scored)
    kept = deduped.filter(F.col("quality_score") >= min_quality)
    scrubbed = scrub_pii(kept, out="text_clean")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    return scrubbed.select(
        "doc_id",
        F.when(bucket % 10 < 8, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
        "n_tokens",
        "quality_score",
        F.col("text_clean").alias("text"),
    )
