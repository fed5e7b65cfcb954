"""Token-budget sequence packing: the concat-then-chunk layout LLM
pretraining uses to turn variable-length documents into fixed-length
training rows.

Semantics (offset-based packing): documents are conceptually concatenated
in id order within a bucket; a document belongs to the sequence in which
its first token lands (`seq_id = start_offset DIV budget`).  This is the
standard "document concatenation + block chunking" layout — documents
longer than the budget still get exactly one owning sequence (their
start block), so the assignment is total and deterministic.

Scale shape: bucketing by an engine-independent md5 of the id bounds
every window to 1/n_buckets of the data — the running-sum window is a
range exchange PER BUCKET, fully parallel, never a single global sort.
At 100 TB set n_buckets >= the cluster's target partition count; the
layout is reproducible at any parallelism because both the bucket and
the order inside it depend only on ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def md5_bucket(col, n_buckets: int):
    """Engine-independent bucket in [0, n_buckets): first 16 bits of
    md5(id), same expression DuckDB spells ('0x' || substring(md5(..)))
    — reproducible across engines and restarts (no Spark-internal hash)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10)
        .cast("long")
        % n_buckets
    )


def pack_sequences(
    docs: DataFrame,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = 1024,
    n_buckets: int = 16,
) -> DataFrame:
    """(bucket, seq_id, n_docs, seq_tokens, first_doc, last_doc): one row
    per packed training sequence.  `seq_tokens` is the token mass whose
    documents START in this sequence (the writer pads/overflows at the
    block boundary; this operator fixes the assignment, which is the part
    that must be deterministic and engine-independent)."""
    bucketed = docs.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        md5_bucket(F.col(id_col), n_buckets).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy(id_col)
    with_seq = bucketed.withColumn(
        "running", F.sum("n_tokens").over(w)
    ).withColumn(
        # start offset of this doc in the bucket's concatenated stream
        "seq_id",
        F.expr(f"(running - n_tokens) DIV {int(budget)}"),
    )
    return with_seq.groupBy("bucket", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


def pack_multimodal_sequences(
    docs: DataFrame,
    text_tokens_col: str = "n_text_tokens",
    images_col: str = "n_images",
    id_col: str = "doc_id",
    budget: int = 2048,
    image_tokens: int = 64,
    n_buckets: int = 16,
) -> DataFrame:
    """Interleaved image-text packing — the training layout multimodal
    pretraining uses (each inline image costs a fixed block of
    ``image_tokens`` placeholder positions next to the document's text
    tokens; LLaVA/Flamingo-style data prep).  Same offset-based
    concat-then-chunk assignment as pack_sequences, but the cost of a
    document is ``n_text_tokens + image_tokens * n_images`` and each
    packed sequence reports its per-modality budget split:
    (bucket, seq_id, n_docs, n_images, text_tokens, image_token_cost,
    seq_tokens, first_doc, last_doc).

    Scale shape identical to pack_sequences: md5 bucketing bounds every
    running-sum window to 1/n_buckets of the data — no global sort."""
    cost = (
        F.col(text_tokens_col).cast("long")
        + F.lit(int(image_tokens)) * F.col(images_col).cast("long")
    )
    bucketed = docs.select(
        F.col(id_col),
        F.col(text_tokens_col).cast("long").alias("_text"),
        F.col(images_col).cast("long").alias("_imgs"),
        cost.alias("_cost"),
        md5_bucket(F.col(id_col), n_buckets).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy(id_col)
    with_seq = bucketed.withColumn(
        "running", F.sum("_cost").over(w)
    ).withColumn("seq_id", F.expr(f"(running - _cost) DIV {int(budget)}"))
    return with_seq.groupBy("bucket", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("_imgs").alias("n_images"),
        F.sum("_text").alias("text_tokens"),
        (F.sum("_imgs") * int(image_tokens)).alias("image_token_cost"),
        F.sum("_cost").alias("seq_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )
