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



def train_test_split_col(id_col: str = "doc_id"):
    """The engine's ONE train/test assignment rule: first 16 bits of
    md5(id) mod 10, buckets 0-7 train (80/20).  Single-sourced here so
    the rule cannot drift between operators — the same document must
    land on the same side of the split everywhere, forever (DuckDB
    spelling: ('0x' || substring(md5(id::VARCHAR), 1, 4))::INT % 10 < 8)."""
    bucket = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
    ).cast("long")
    return (
        F.when(bucket % 10 < 8, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split")
    )


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
    return scrubbed.select(
        "doc_id",
        train_test_split_col(),
        "n_tokens",
        "quality_score",
        F.col("text_clean").alias("text"),
    )


def prepare_corpus_full(
    docs: DataFrame,
    benchmark: DataFrame,
    min_quality: float = 0.3,
    line_min_docs: int = 2,
    ngram: int = 5,
) -> DataFrame:
    """The whole crawl-to-corpus chain as ONE declarative plan:

        line-level boilerplate dedup -> exact dedup -> quality gate
        -> PII scrub -> benchmark decontamination -> split

    (doc_id, split, n_tokens, quality_score, text) for every surviving
    document. Ordering is the load-bearing part: the quality gate must
    see line-cleaned but unscrubbed text (true token counts, no banner
    inflation); the scrub runs only on gated survivors; decontamination
    greps the text that would actually ship (cleaned + scrubbed); the
    split is assigned by md5 of the surviving doc_id, engine- and
    parallelism-independent.

    The decontamination gate is inlined rather than composed from
    decontaminate(): a two-branch form (flags + join back) would execute
    the whole upstream chain twice — here the survivors explode into
    shingles once, a broadcast left join marks hits map-side, and a
    first()-carry aggregate collapses back to one row per doc (partial
    aggregation makes the exchange ~one row per document). Shuffles in
    the full plan: the line dedup's two uniform hash aggs, the exact
    dedup's content window, and this one — each on a uniform key, none
    carrying more than the corpus' surviving rows.
    """
    from open_ocr_spark.dataops.decontam import word_ngrams
    from open_ocr_spark.dataops.lines import dedup_lines

    cleaned = dedup_lines(docs, min_docs=line_min_docs).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    prepared = prepare_corpus(cleaned, min_quality)
    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams(F.col("text"), ngram)).alias("gram")
        )
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    exploded = prepared.select(
        "doc_id",
        "split",
        "n_tokens",
        "quality_score",
        "text",
        F.explode_outer(
            F.array_distinct(word_ngrams(F.col("text"), ngram))
        ).alias("gram"),
    )
    return (
        exploded.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.first("split").alias("split"),
            F.first("n_tokens").alias("n_tokens"),
            F.first("quality_score").alias("quality_score"),
            F.first("text").alias("text"),
            F.count("hit").alias("n_hits"),
        )
        .filter(F.col("n_hits") == 0)
        .drop("n_hits")
    )


def clean_web_corpus(
    pages: DataFrame,
    *,
    min_docs: int = 3,
    frac_num: int = 1,
    frac_den: int = 2,
) -> DataFrame:
    """The round-5 crawl-cleaning stages composed as ONE plan:

        mojibake repair -> host template-line strip -> reflow -> split

    over (doc_id, host, text) pages.  Returns (doc_id, text, n_paras,
    n_removed, was_repaired, split).  Ordering is the load-bearing
    part, the same reason prepare_corpus_full exists: the repair must
    run FIRST (damaged bytes would break both the template evidence
    keys and the reflow regexes); the template strip must see the LINE
    structure, so it runs before reflow unwraps it; the reflow runs on
    template-free text so banner lines cannot be glued into body
    paragraphs; the split is md5-of-doc_id, independent of everything.

    Every stage is individually oracle-checked elsewhere
    (mojibake_repair, host_template_lines, reflow_text); the composed
    query's oracle replays the three stages in order via the stages'
    own SQL-replay helpers.

    Shuffles in the plan (the 100 TB question): the template stage's
    evidence aggregate + verdict join on uniform (host, md5(line)) keys
    and its per-doc reassembly, plus one doc_id equi-join carrying the
    repair flag back to the aggregated rows — repair, reflow, and split
    are shuffle-free projections fused by Catalyst."""
    from open_ocr_spark.dataops.mojibake import is_mojibake, repair_mojibake
    from open_ocr_spark.dataops.reflow import n_paragraphs, reflow_text
    from open_ocr_spark.dataops.templates import strip_template_lines

    staged = pages.select(
        "doc_id",
        "host",
        repair_mojibake(F.col("text")).alias("text"),
        is_mojibake(F.col("text")).alias("was_repaired"),
    )
    stripped = strip_template_lines(
        staged, min_docs=min_docs, frac_num=frac_num, frac_den=frac_den
    )
    flags = staged.select("doc_id", "was_repaired")
    return stripped.join(flags, "doc_id").select(
        "doc_id",
        reflow_text(F.col("clean_text")).alias("text"),
        n_paragraphs(F.col("clean_text")).alias("n_paras"),
        "n_removed",
        "was_repaired",
        train_test_split_col(),
    )
