"""Hierarchical text assembly from the flattened span table (operator A1).

Rebuilds document text from word-leaf spans with the reference's
exact per-level separators (ocr_schema.py:85,102,119,147,182,198,254)
as a cascade of groupBy + array_sort(collect_list(struct(ordinal,
text))) + concat_ws — fully Catalyst-native (whole-stage codegen'd,
map-side partial aggregation at every level; the only shuffle is on
the grouping keys, which shrink every level).

Ordering is explicit by ordinal at every level — NEVER arrival order
— which is what makes the output byte-identical under any
parallelism (SURVEY.md §7 "what's hard" #1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_compare_spark.schema import SEP_BLOCK, SEP_DOCUMENT, SEP_LINE, SEP_PAGE, SEP_PARAGRAPH


def _ordered_concat(df: DataFrame, keys: list[str], ordinal: str, text_col: str, sep: str, out: str) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col(ordinal).alias("o"), F.col(text_col).alias("t")))),
                lambda x: x.t,
            ),
        ).alias(out)
    )


def assemble_blocks(spans: DataFrame) -> DataFrame:
    """span rows -> one row per (url, engine, page_no, block_no) with
    block_text and block_type — the word->line->para->block prefix of
    the assembly cascade, exposed for consumers that operate at block
    granularity (layout chunking, geometry joins)."""
    return _assemble_blocks(spans.repartition("url", "engine"))


def assemble_doc_text(spans: DataFrame) -> DataFrame:
    """span rows -> (url, engine, doc_text), byte-identical to the
    engines' fast-path assembly. Handles TEXT and TABLE blocks."""
    base = ["url", "engine"]

    # One shuffle on the coarsest key up front: HashPartitioning
    # (url, engine) is a subset of every finer grouping's keys, so
    # the whole word->line->para->block->page->doc cascade runs
    # exchange-free (measured: 10 exchanges -> 4, ~6x faster).
    blocks = _assemble_blocks(spans.repartition("url", "engine"))

    pages = _ordered_concat(blocks, base + ["page_no"], "block_no", "block_text", SEP_PAGE, "page_text")
    docs = _ordered_concat(pages, base, "page_no", "page_text", SEP_DOCUMENT, "doc_text")
    return docs


def _assemble_blocks(spans: DataFrame) -> DataFrame:
    """Single-branch cascade handling TEXT and TABLE blocks together.

    Earlier this was two filtered branches (TEXT cascade ∪ TABLE
    markdown cascade) over the same span input. Column pruning gave
    each branch a different projection below the repartition
    exchange, so ReuseExchange could not dedupe them and the ENTIRE
    upstream (extraction UDF included) ran twice — measured in the
    sf0.1 bench as the dominant cost of spans_assemble. The merged
    cascade scans and shuffles once:

    - level 1 (word -> line/cell): group by all four fine ordinals.
      Within any block the inapplicable ones are constants (TEXT:
      row_no/column_no NULL; TABLE: para_no=0, line_no=row_no — see
      extract.doc_to_result), so the groups are exactly the old
      per-branch groups, and both branches join words with SEP_LINE.
    - level 2 (line -> para | cell -> markdown row): order by
      coalesce(column_no, line_no); the combine expression is
      conditional on block_type.
    - level 3 (-> block): order by coalesce(row_no, para_no); TEXT
      joins with SEP_BLOCK, TABLE renders header + '---' separator
      row (widths from the true header cell count, ocr_schema.py
      markdown contract) + body rows.
    """
    base = ["url", "engine"]

    lines = _ordered_concat(
        spans,
        base + ["page_no", "block_no", "block_type", "para_no", "line_no", "row_no", "column_no"],
        "word_no", "text", SEP_LINE, "line_text",
    )

    lvl2_ord = F.coalesce(F.col("column_no"), F.col("line_no"))
    lvl2 = (
        lines.groupBy(*base, "page_no", "block_no", "block_type", "para_no", "row_no")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(lvl2_ord.alias("o"), F.col("line_text").alias("t")))
            ).alias("parts"),
            (F.max(lvl2_ord) + 1).alias("n_cols"),
        )
        .select(
            *base,
            "page_no",
            "block_no",
            "block_type",
            "para_no",
            "row_no",
            "n_cols",
            F.when(
                F.col("block_type") == "TABLE",
                F.concat(
                    F.lit("| "),
                    F.concat_ws(" | ", F.transform(F.col("parts"), lambda x: x.t)),
                    F.lit(" |"),
                ),
            )
            .otherwise(F.concat_ws(SEP_PARAGRAPH, F.transform(F.col("parts"), lambda x: x.t)))
            .alias("part_text"),
        )
    )

    lvl3_ord = F.coalesce(F.col("row_no"), F.col("para_no"))
    sep_row = F.concat(
        F.lit("| "),
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.element_at("rws", 1).c.cast("int")), lambda _: F.lit("---")),
            " | ",
        ),
        F.lit(" |"),
    )
    return (
        lvl2.groupBy(*base, "page_no", "block_no", "block_type")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(lvl3_ord.alias("o"), F.col("part_text").alias("t"), F.col("n_cols").alias("c"))
                )
            ).alias("rws")
        )
        .select(
            *base,
            "page_no",
            "block_no",
            "block_type",
            F.when(
                F.col("block_type") == "TABLE",
                F.array_join(
                    F.concat(
                        F.array(F.element_at("rws", 1).t, sep_row),
                        F.transform(
                            F.slice("rws", 2, F.greatest(F.size("rws") - 1, F.lit(0))), lambda x: x.t
                        ),
                    ),
                    "\n",
                ),
            )
            .otherwise(F.array_join(F.transform(F.col("rws"), lambda x: x.t), SEP_BLOCK))
            .alias("block_text"),
        )
    )


def assemble_table_tsv(spans: DataFrame) -> DataFrame:
    """TABLE spans -> the reference's TSV ``raw_text`` fallback
    (ocr_schema.py:324-334: '\\t'.join(cells) per row, '\\n'.join
    rows) — the non-markdown rendering variant, same ordinal-sorted
    native cascade as the markdown path."""
    base = ["url", "engine"]
    table_spans = spans.filter(F.col("block_type") == "TABLE")
    cells = _ordered_concat(
        table_spans,
        base + ["page_no", "block_no", "row_no", "column_no"],
        "word_no", "text", SEP_LINE, "cell_text",
    )
    rows = _ordered_concat(
        cells, base + ["page_no", "block_no", "row_no"], "column_no", "cell_text", "\t", "row_text"
    )
    return _ordered_concat(
        rows, base + ["page_no", "block_no"], "row_no", "row_text", "\n", "raw_text"
    )
