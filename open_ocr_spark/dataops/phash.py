"""Perceptual image hashing (dHash) for multimodal near-dup grouping.

Text near-dup has MinHash/SimHash tiers (dataops/dedup.py); this is the
image-side counterpart: decode pixels (the repo's real stdlib+numpy
decoders — PNG/JPEG/GIF/BMP/PPM), grayscale, block-average to an 8x8
grid with EXACT integer arithmetic (floor of block sums — no float
resampling, so the hash is bit-identical on every host), then the
classic difference hash: bit (r,c) set iff gray[r][c+1] > gray[r][c].
8 rows x 7 comparisons = 56 bits — sign-safe in int64 on both engines.

Grouping by dhash is then exact dedup machinery: one hash-partial
groupBy, map-side combine, no pairwise comparisons anywhere — the same
bucket-don't-compare shape as the text LSH tiers, and robust to the
perturbations dHash is designed for (brightness shifts, low-bit noise)
because only ORDER between neighboring cells matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRID = 8  # 8x8 grid -> 56-bit hash


def dhash_value(arr) -> int:
    """56-bit dHash of an (h, w, 3) uint8 array — pure integer math."""
    import numpy as np

    g = arr.astype(np.int64).sum(axis=2) // 3
    h, w = g.shape
    if (h, w) != (GRID, GRID):
        out = np.empty((GRID, GRID), dtype=np.int64)
        for r in range(GRID):
            r0, r1 = r * h // GRID, (r + 1) * h // GRID
            for c in range(GRID):
                c0, c1 = c * w // GRID, (c + 1) * w // GRID
                blk = g[r0:r1, c0:c1]
                out[r, c] = int(blk.sum()) // blk.size
        g = out
    bits = (g[:, 1:] > g[:, :-1]).reshape(-1).astype(np.int64)
    weights = np.int64(1) << np.arange(GRID * (GRID - 1), dtype=np.int64)
    return int((bits * weights).sum())


def dhash_images(
    media: DataFrame,
    img_col: str = "payload",
    out_col: str = "dhash",
    strict: bool = False,
) -> DataFrame:
    """Adds `out_col`: the 56-bit dHash (null for undecodable payloads,
    or raise when strict — same error contract as resize_images)."""
    from pyspark.sql.functions import pandas_udf

    def _dhash(payloads):
        import pandas as pd

        from open_ocr_spark.dataops.multimodal import decode_pixels

        out = []
        for p in payloads:
            arr = None if p is None else decode_pixels(bytes(p))
            if arr is None:
                if strict:
                    raise ValueError("undecodable image payload")
                out.append(None)
            else:
                out.append(dhash_value(arr))
        return pd.Series(out, dtype="object")

    return media.withColumn(
        out_col, pandas_udf(_dhash, "long")(F.col(img_col))
    )


def image_near_dup_groups(
    media: DataFrame,
    img_col: str = "payload",
    id_col: str = "doc_id",
    strict: bool = False,
) -> DataFrame:
    """(dhash, n_docs, min_doc, max_doc): perceptual duplicate groups —
    one hash aggregate over the corpus, no pairwise stage."""
    return (
        dhash_images(media, img_col, "dhash", strict)
        .groupBy("dhash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min(id_col).alias("min_doc"),
            F.max(id_col).alias("max_doc"),
        )
    )
