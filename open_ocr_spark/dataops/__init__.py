"""Training-data pipeline operations over document/embedding tables:
deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard), similarity
search (brute-force cosine top-k, LSH-bucketed ANN), text analysis
(token counts, quality scoring, language-ID, fingerprinting), and
multimodal binary-column plumbing.

Everything stays JVM-side (built-in pyspark.sql.functions) except the
explicitly-kernel ops (language-ID), which use Arrow-batched pandas UDFs —
never per-row Python.
"""
