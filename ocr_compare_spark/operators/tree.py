"""Nested canonical tree + element_path derivation (SURVEY §1.3
representation (a)).

The reference's canonical result is a rooted ordered tree of
dataclasses (/root/reference/src/ocrtool/canonical_ocr/
ocr_schema.py:23-339) and its converters address nodes by slash
paths (gdai_convert.py:87-98). Our workhorse is the flattened span
table; this module recovers the nested ``document`` struct column —
cascaded collect_list + array_sort, explicitly ordered by ordinals
at every level (same byte-order guarantee as assemble.py) — and
derives element_path strings natively.

Scale shape: one repartition on (url, engine) up front, then every
groupBy key is a superset prefix — the whole cascade is
exchange-free, identical to the assembly argument.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def element_path() -> Column:
    """Slash path of a word span (gdai_convert.py:87-98 style):
    pages/{p}/blocks/{b}/paragraphs/{q}/lines/{l}/words/{w}
    (0-based indices, page_no is stored 1-based)."""
    return F.concat_ws(
        "/",
        F.lit("pages"), (F.col("page_no") - 1).cast("string"),
        F.lit("blocks"), F.col("block_no").cast("string"),
        F.lit("paragraphs"), F.col("para_no").cast("string"),
        F.lit("lines"), F.col("line_no").cast("string"),
        F.lit("words"), F.col("word_no").cast("string"),
    )


def _nest(df: DataFrame, keys: list[str], ordinal: str, child: str, out: str) -> DataFrame:
    """Collect child structs into an ordinal-sorted array per key."""
    return df.groupBy(*keys).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col(ordinal).alias("o"), F.col(child).alias("c")))
            ),
            lambda x: x.c,
        ).alias(out)
    )


def to_tree(spans: DataFrame) -> DataFrame:
    """span rows -> (url, engine, document) where document is the
    nested struct  pages: array<struct<page_no, blocks:
    array<struct<block_no, block_type, paragraphs: array<struct<
    para_no, lines: array<struct<line_no, words: array<struct<
    word_no, text, confidence>>>>>>>>>.

    TABLE spans ride along with their ordinals (para_no=0,
    line_no=row_no) — the tree is positional, block_type says how to
    render it."""
    base = ["url", "engine"]
    s = spans.repartition(*base).withColumn(
        "word", F.struct(F.col("word_no"), F.col("text"), F.col("confidence"))
    )
    lines = _nest(
        s, base + ["page_no", "block_no", "block_type", "para_no", "line_no"],
        "word_no", "word", "words",
    ).withColumn("line", F.struct(F.col("line_no"), F.col("words")))
    paras = _nest(
        lines, base + ["page_no", "block_no", "block_type", "para_no"],
        "line_no", "line", "lines",
    ).withColumn("para", F.struct(F.col("para_no"), F.col("lines")))
    blocks = _nest(
        paras, base + ["page_no", "block_no", "block_type"],
        "para_no", "para", "paragraphs",
    ).withColumn(
        "block", F.struct(F.col("block_no"), F.col("block_type"), F.col("paragraphs"))
    )
    pages = _nest(blocks, base + ["page_no"], "block_no", "block", "blocks").withColumn(
        "page", F.struct(F.col("page_no"), F.col("blocks"))
    )
    docs = _nest(pages, base, "page_no", "page", "pages")
    return docs.select(*base, F.struct(F.col("pages")).alias("document"))


def tree_stats(tree: DataFrame) -> DataFrame:
    """Per-document node counts computed FROM the nested struct
    (proving the tree, not the span table): folds over the nested
    arrays, all native."""
    pages = F.col("document.pages")

    def sum_over(arr: Column, f) -> Column:
        return F.aggregate(arr, F.lit(0), lambda acc, x: acc + f(x))

    n_blocks = sum_over(pages, lambda p: F.size(p.blocks))
    n_paras = sum_over(pages, lambda p: sum_over(p.blocks, lambda b: F.size(b.paragraphs)))
    n_lines = sum_over(
        pages,
        lambda p: sum_over(
            p.blocks, lambda b: sum_over(b.paragraphs, lambda q: F.size(q.lines))
        ),
    )
    n_words = sum_over(
        pages,
        lambda p: sum_over(
            p.blocks,
            lambda b: sum_over(
                b.paragraphs, lambda q: sum_over(q.lines, lambda l: F.size(l.words))
            ),
        ),
    )
    return tree.select(
        "url",
        "engine",
        F.size(pages).cast("long").alias("n_pages"),
        n_blocks.cast("long").alias("n_blocks"),
        n_paras.cast("long").alias("n_paras"),
        n_lines.cast("long").alias("n_lines"),
        n_words.cast("long").alias("n_words"),
    )


def tree_to_text(tree: DataFrame) -> DataFrame:
    """Rebuild doc_text from the NESTED struct with the reference
    separators (ocr_schema.py:85-198) — the byte-identical proof that
    the tree is a faithful representation. TEXT trees only: table
    cell structure (row_no/column_no) is not positional, so TABLE
    blocks render via the span-table path (assemble.py) instead."""
    doc = F.array_join(
        F.transform(
            F.col("document.pages"),
            lambda p: F.array_join(
                F.transform(
                    p.blocks,
                    lambda b: F.array_join(
                        F.transform(
                            b.paragraphs,
                            lambda q: F.array_join(
                                F.transform(
                                    q.lines,
                                    lambda l: F.array_join(
                                        F.transform(l.words, lambda w: w.text), " "
                                    ),
                                ),
                                " ",
                            ),
                        ),
                        "\n",
                    ),
                ),
                "\n\n",
            ),
        ),
        "\n=====\n",
    )
    return tree.select("url", "engine", doc.alias("doc_text"))
