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
    """Single-branch cascade handling TEXT, TABLE and NESTED blocks
    together (one scan, one shuffle — see the merged-cascade note in
    assemble_doc_text; the old two-branch union re-ran extraction
    under divergent column pruning).

    Recursion (reference Block.elements: List[Table|Paragraph|Block],
    ocr_schema.py:130-167) costs NOTHING extra in the plan: because
    the block separator is '\\n' at every nesting level, a top-level
    block's text is a flat '\\n'-join of its rendered elements in
    LEXICOGRAPHIC elem_path order — no recursive plan needed.

    Levels (all groupBy keys share the (url, engine) prefix, so the
    whole cascade runs exchange-free after one repartition):
    - L1 word -> line (TEXT) / cell-paragraph (TABLE): the grouping
      is unique per (elem_path, para_no, line_no, row, col); words
      join with SEP_LINE.
    - L2 line -> paragraph | cell-para -> cell: within a group the
      varying ordinal is line_no for TEXT and para_no (Cell.blocks
      runs) for TABLE; both join with ' '.
    - L3 cell -> markdown row: TABLE wraps '| .. | .. |'; TEXT
      passes through (single part).
    - L4 row -> ELEMENT: TABLE joins its rows with the header rule
      (separator row only when row 0 is a HEADER row — reference
      Table.header is Optional); TEXT passes through.
    - L5 element -> block: parts ordered by the elem_path suffix
      (after the top block ordinal), joined with SEP_BLOCK.
    """
    base = ["url", "engine"]

    lines = _ordered_concat(
        spans,
        base + ["page_no", "block_no", "block_type", "elem_path", "para_no",
                "line_no", "row_no", "column_no", "row_type"],
        "word_no", "text", SEP_LINE, "line_text",
    )

    # L2: TEXT orders lines by line_no; TABLE orders cell-para runs
    # by para_no (the cell flattens Cell.blocks with ' ').
    l2_ord = F.when(F.col("row_no").isNotNull(), F.col("para_no")).otherwise(F.col("line_no"))
    l2 = (
        lines.groupBy(*base, "page_no", "block_no", "block_type", "elem_path", "row_no", "column_no", "row_type")
        .agg(
            F.concat_ws(
                SEP_PARAGRAPH,
                F.transform(
                    F.array_sort(F.collect_list(F.struct(l2_ord.alias("o"), F.col("line_text").alias("t")))),
                    lambda x: x.t,
                ),
            ).alias("cell_text")
        )
    )

    # L3: cells -> markdown row (TEXT: single part passthrough).
    l3_ord = F.coalesce(F.col("column_no"), F.lit(0))
    l3 = (
        l2.groupBy(*base, "page_no", "block_no", "block_type", "elem_path", "row_no", "row_type")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(l3_ord.alias("o"), F.col("cell_text").alias("t")))
            ).alias("parts"),
            (F.max("column_no") + 1).alias("n_cols"),
        )
        .select(
            *base, "page_no", "block_no", "block_type", "elem_path", "row_no", "row_type", "n_cols",
            F.when(
                F.col("block_type") == "TABLE",
                F.concat(
                    F.lit("| "),
                    F.concat_ws(" | ", F.transform(F.col("parts"), lambda x: x.t)),
                    F.lit(" |"),
                ),
            )
            .otherwise(F.element_at("parts", 1).t)
            .alias("row_text"),
        )
    )

    # L4: rows -> element. TABLE renders header + '---' separator row
    # ONLY when row 0 is a HEADER row; headerless tables are all body.
    sep_row = F.concat(
        F.lit("| "),
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.element_at("rws", 1).c.cast("int")), lambda _: F.lit("---")),
            " | ",
        ),
        F.lit(" |"),
    )
    has_header = F.element_at("rws", 1).h == "HEADER"
    l4 = (
        l3.groupBy(*base, "page_no", "block_no", "block_type", "elem_path")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.coalesce(F.col("row_no"), F.lit(0)).alias("o"),
                        F.col("row_text").alias("t"),
                        F.col("n_cols").alias("c"),
                        F.col("row_type").alias("h"),
                    )
                )
            ).alias("rws")
        )
        .select(
            *base, "page_no", "block_no", "block_type", "elem_path",
            F.when(
                F.col("block_type") == "TABLE",
                F.when(
                    has_header,
                    F.array_join(
                        F.concat(
                            F.array(F.element_at("rws", 1).t, sep_row),
                            F.transform(
                                F.slice("rws", 2, F.greatest(F.size("rws") - 1, F.lit(0))), lambda x: x.t
                            ),
                        ),
                        "\n",
                    ),
                ).otherwise(F.array_join(F.transform(F.col("rws"), lambda x: x.t), "\n")),
            )
            .otherwise(F.element_at("rws", 1).t)
            .alias("elem_text"),
        )
    )

    # L5: elements -> block, ordered by the elem_path suffix after
    # the top block ordinal (lexicographic array order = DFS order).
    suffix = F.slice(F.col("elem_path"), 2, F.size("elem_path") - 1)
    return (
        l4.groupBy(*base, "page_no", "block_no")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(suffix.alias("o"), F.col("elem_text").alias("t"), F.col("block_type").alias("bt"))
                )
            ).alias("elems")
        )
        .select(
            *base, "page_no", "block_no",
            # top block's type = its first element's (exact for
            # uniform blocks, i.e. everything non-nested)
            F.element_at("elems", 1).bt.alias("block_type"),
            F.array_join(F.transform(F.col("elems"), lambda x: x.t), SEP_BLOCK).alias("block_text"),
        )
    )


def assemble_table_tsv(spans: DataFrame) -> DataFrame:
    """TABLE spans -> the reference's TSV ``raw_text`` fallback
    (ocr_schema.py:324-334: '\\t'.join(cells) per row, '\\n'.join
    rows; header row included as a plain row) — the non-markdown
    rendering variant, same ordinal-sorted native cascade as the
    markdown path. One output row per table ELEMENT (elem_path keeps
    nested tables distinct); multi-paragraph cells flatten with ' '.
    """
    base = ["url", "engine"]
    table_spans = spans.filter(F.col("block_type") == "TABLE")
    cell_paras = _ordered_concat(
        table_spans,
        base + ["page_no", "block_no", "elem_path", "para_no", "row_no", "column_no"],
        "word_no", "text", SEP_LINE, "run_text",
    )
    cells = _ordered_concat(
        cell_paras,
        base + ["page_no", "block_no", "elem_path", "row_no", "column_no"],
        "para_no", "run_text", SEP_LINE, "cell_text",
    )
    rows = _ordered_concat(
        cells, base + ["page_no", "block_no", "elem_path", "row_no"],
        "column_no", "cell_text", "\t", "row_text",
    )
    return _ordered_concat(
        rows, base + ["page_no", "block_no", "elem_path"], "row_no", "row_text", "\n", "raw_text"
    ).drop("elem_path")
