"""Bbox union-envelope aggregations (operators A4/A5/A6, P5/P9).

Reference: the canonical tree aggregates geometry bottom-up —
line/para/block boxes are unions of their children's boxes
(/root/reference/src/ocrtool/ocr_impls/tesseract/
tesseract_executor.py:210-265), the page extent is the max
right/bottom edge (tesseract_executor.py:307-316), and document
dimensions are max page width / SUM of page heights
(/root/reference/src/ocrtool/ocr_impls/gdai/gdai_convert.py:361-363).

Spark-native: every level is one groupBy with min/max aggregates
(map-side partial combine; the grouping keys shrink each level, and
all levels after the first are exchange-free under the span table's
(url, engine) partitioning — same cascade argument as assemble.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# grouping keys per level, coarsest last (each is a prefix of the
# finer one, so cascaded calls stay exchange-free). Paragraph
# identity is elem_path (nest-safe: (block_no, para_no) is NOT unique
# under recursive blocks — see schema.py).
LEVEL_KEYS: dict[str, list[str]] = {
    "line": ["url", "engine", "page_no", "block_no", "elem_path", "line_no"],
    "para": ["url", "engine", "page_no", "block_no", "elem_path"],
    "block": ["url", "engine", "page_no", "block_no"],
}


def bbox_envelopes(spans: DataFrame, level: str = "block") -> DataFrame:
    """Union envelope of the word bboxes at the given level:
    (left, top) = min corner, (width, height) = max opposite corner
    minus min corner — exactly the reference's union_bbox fold."""
    from ocr_compare_spark.operators.extract import with_elem_path

    keys = LEVEL_KEYS[level]
    b = with_elem_path(spans).filter(F.col("bbox").isNotNull())
    left = F.min("bbox.left")
    top = F.min("bbox.top")
    right = F.max(F.col("bbox.left") + F.col("bbox.width"))
    bottom = F.max(F.col("bbox.top") + F.col("bbox.height"))
    return b.groupBy(*keys).agg(
        left.alias("left"),
        top.alias("top"),
        (right - left).alias("width"),
        (bottom - top).alias("height"),
        F.count("*").alias("n_words"),
    )


def page_extent(spans: DataFrame) -> DataFrame:
    """Page extent = max right / max bottom edge over the page's
    word boxes (tesseract_executor.py:307-316: width = max(left +
    width), height = max(top + height))."""
    b = spans.filter(F.col("bbox").isNotNull())
    return b.groupBy("url", "engine", "page_no").agg(
        F.max(F.col("bbox.left") + F.col("bbox.width")).alias("page_width"),
        F.max(F.col("bbox.top") + F.col("bbox.height")).alias("page_height"),
    )


def doc_dims(spans: DataFrame) -> DataFrame:
    """Document dimensions from page extents: width = max page
    width, height = SUM of page heights (gdai_convert.py:361-363 —
    pages stack vertically)."""
    return page_extent(spans).groupBy("url", "engine").agg(
        F.max("page_width").alias("doc_width"),
        F.sum("page_height").alias("doc_height"),
        F.count("*").alias("n_pages"),
    )
