"""crawler_to_md_spark — a from-scratch PySpark-native distributed crawl +
analytics engine with the query/data-processing capabilities of the
reference crawler (obeone/crawler-to-md, surveyed in SURVEY.md).

Architecture (Spark-first, NOT a port):

- ``session``            SparkSession factory (AQE, Arrow, tuned shuffle).
- ``functions.urls``     RFC-3986-lite URL canonicalization, validity
                         filters, 64-bit hashing — JVM column expressions in
                         the hot path, Arrow UDF for full resolution.
- ``functions.text``     Markdown transforms (header shift, newline
                         collapse, metadata comment) as column expressions /
                         higher-order functions.
- ``functions.imagecodec`` deterministic image codec (numpy+zlib stand-in —
                         real codecs are not installed in this sandbox),
                         real PSNR / perceptual-hash math, Arrow UDFs.
- ``tables``             snapshot-table layer: parquet datasets + atomic
                         JSON manifest commits (Iceberg-shaped; swap for a
                         real Iceberg catalog via config in production).
- ``crawl``              frontier schema, synthetic corpus, BFS wave engine
                         (deterministic discovery_rank, resume-from-
                         checkpoint, per-wave metrics).
- ``operators``          seen-set (bloom shards + exact anti-join),
                         politeness (salted host windows), dedup (exact /
                         MinHash-LSH / SimHash / n-gram Jaccard / embedding),
                         near-dup clustering (connected components +
                         canonical selection), similarity search, text
                         stats, multimodal plumbing, exports.
"""

__version__ = "0.1.0"
