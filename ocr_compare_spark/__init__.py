"""ocr_compare_spark — a from-scratch PySpark-native multi-engine
text-extraction-and-comparison engine with the capabilities of the
reference library ronpik/ocr-compare (see /root/reference, v0.2.3).

The reference runs N independent OCR/extraction engines over a
document's raw bytes, normalizes each engine's native output into one
canonical hierarchical layout schema, and computes cross-engine
comparison metrics (reference: src/ocrtool/ocr.py, ocr_executor.py).

This package re-expresses that loop Spark-first, at web scale:

- input: a Common-Crawl-style table ``(url string, warc_ts timestamp,
  html binary, text string, lang string)``
- engines: DOM-heuristic boilerplate stripper, density scorer, and a
  PDF byte-stream parser — each an Arrow-vectorized pandas UDF
  (reference engine analogs: tesseract / gdai-ocr / gdai-layout)
- canonical result: a flattened *span table* (one row per word-leaf)
  plus assembled document text using the reference's exact per-level
  separators (reference: src/ocrtool/canonical_ocr/ocr_schema.py:85,
  102,119,147,182,198,254)
- comparison: pairwise Jaccard / CER / WER / LCS per url as a wide
  DataFrame, plus a winner-per-url selection window
- ops: content-hash cache table, per-partition checkpoint manifest,
  extractor-level metrics, oversized-document chunking, skew salting.

Everything is DataFrame/Catalyst-native except the per-document
parsers and the string-alignment metrics, which are pandas UDFs
(Arrow batches — no per-row Python anywhere on the hot path).
"""

__version__ = "0.1.0"

from ocr_compare_spark.session import get_spark  # noqa: F401
