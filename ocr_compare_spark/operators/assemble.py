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

# _assemble_blocks' single-pass L1 (cell paragraph runs folding with
# the word separator) relies on the line and paragraph separators
# being identical (ocr_schema.py:102,119 — both ' ')
assert SEP_LINE == SEP_PARAGRAPH


def _ordered_concat(df: DataFrame, keys: list[str], ordinal, text_col: str, sep: str, out: str) -> DataFrame:
    o = F.col(ordinal) if isinstance(ordinal, str) else ordinal
    return df.groupBy(*keys).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct(o.alias("o"), F.col(text_col).alias("t")))),
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

    Three aggregation levels — measured as the sweet spot in BOTH
    directions: a 5-level variant ran 2.8x slower from the extra
    ObjectHashAggregate passes (r2), and an r4 experiment FUSING
    L1+L2 into one word->element aggregation (legal since line sep ==
    para sep == ' ') was 1.28x SLOWER than this three-level form in a
    same-window A/B (2.58s vs 3.30s at sf0.1) — the interpreted
    per-word markdown fold plus the larger sorted arrays cost more
    than the saved codegen'd aggregate pass. All groupBy keys share
    the (url, engine) prefix, so the whole cascade runs exchange-free
    after one repartition:
    - L1 word -> line (TEXT) / cell (TABLE): ordering by
      (para_no, word_no) folds a cell's paragraph runs (Cell.blocks)
      and its words in one pass — both join with ' '.
    - L2 line/cell -> ELEMENT: TEXT joins lines with ' '; TABLE
      folds (row, col)-ordered cells straight into markdown, row
      framing encoded in the between-cell separator and the '---'
      row inserted on the 0->1 row transition when row 0 is HEADER
      (reference Table.header is Optional).
    - L3 element -> block: parts ordered by the elem_path suffix
      (after the top block ordinal), joined with SEP_BLOCK.

    KEY SCHEME: the stored span table keeps elem_path NULL for flat
    TEXT spans (schema.py) — the cascade does NOT normalize it to a
    materialized [block_no, para_no] array (the old with_elem_path
    pre-pass allocated + hashed one small array per WORD through the
    shuffle and all three aggregates, ~97% of them flat). Instead the
    group key is the PAIR (elem_path, flat_para) where flat_para =
    para_no iff elem_path is NULL: flat paragraphs group by the int,
    explicit-path spans (nested + TABLE, which always store the path)
    group by the array — the same groups, zero per-word allocation.
    Arrays are only built at L3 over ELEMENT-level rows (tens of
    times fewer)."""
    base = ["url", "engine"]
    flat_para = F.when(F.col("elem_path").isNull(), F.col("para_no"))

    # L1: word -> line (TEXT) / cell (TABLE). Ordering by
    # (para_no, word_no) makes this ONE level for both kinds: a TEXT
    # line has constant para_no, and a TABLE cell's paragraph runs
    # flatten with the same ' ' separator the words use, so the flat
    # (run, word)-ordered join IS the Cell.blocks rendering.
    l1_ord = F.struct(F.col("para_no").alias("p"), F.col("word_no").alias("w"))
    lines = (
        spans.withColumn("flat_para", flat_para)
        .groupBy(
            *base, "page_no", "block_no", "block_type", "elem_path", "flat_para",
            "line_no", "row_no", "column_no", "row_type",
        )
        .agg(
            F.concat_ws(
                SEP_LINE,
                F.transform(
                    F.array_sort(F.collect_list(F.struct(l1_ord.alias("o"), F.col("text").alias("t")))),
                    lambda x: x.t,
                ),
            ).alias("part_text")
        )
    )

    # L2: lines/cells -> ELEMENT in one aggregation. TEXT joins its
    # lines with ' '; TABLE folds its (row, col)-ordered cells into
    # markdown directly — the separator between consecutive cells
    # encodes the row framing, with the '---' separator row inserted
    # on the 0 -> 1 row transition when row 0 is a HEADER row
    # (reference Table.header is Optional). n_cols/has_header/n_rows
    # come from plain aggregates so the sorted array is evaluated
    # exactly once per branch.
    part_ord = F.struct(
        F.coalesce(F.col("row_no"), F.col("line_no")).alias("r"),
        F.coalesce(F.col("column_no"), F.lit(0)).alias("c"),
    )
    l2 = (
        lines.groupBy(*base, "page_no", "block_no", "block_type", "elem_path", "flat_para")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(part_ord.alias("o"), F.col("part_text").alias("t"))
                )
            ).alias("parts"),
            F.sum(F.when(F.col("row_no") == 0, 1).otherwise(0)).alias("n_cols0"),
            F.max(F.when(F.col("row_type") == "HEADER", True).otherwise(False)).alias("has_header"),
            (F.max("row_no") + 1).alias("n_rows"),
        )
    )
    sep_row = F.concat(
        F.lit("| "),
        F.array_join(F.transform(F.sequence(F.lit(1), F.col("n_cols0").cast("int")), lambda _: F.lit("---")), " | "),
        F.lit(" |"),
    )
    folded = F.aggregate(
        F.col("parts"),
        F.struct(F.lit("").alias("txt"), F.lit(-1).alias("row"), F.lit(True).alias("first")),
        lambda acc, p: F.struct(
            F.concat(
                acc.txt,
                F.when(acc.first, F.lit("| "))
                .when(p.o.r == acc.row, F.lit(" | "))
                .otherwise(
                    F.concat(
                        F.lit(" |\n"),
                        F.when((acc.row == 0) & F.col("has_header"), F.concat(sep_row, F.lit("\n"))).otherwise(F.lit("")),
                        F.lit("| "),
                    )
                ),
                p.t,
            ).alias("txt"),
            p.o.r.alias("row"),
            F.lit(False).alias("first"),
        ),
    )
    table_text = F.concat(
        folded.txt,
        F.lit(" |"),
        # header-only table: the 0 -> 1 transition never happens, so
        # the separator row goes at the end
        F.when(F.col("has_header") & (F.col("n_rows") == 1), F.concat(F.lit("\n"), sep_row)).otherwise(F.lit("")),
    )
    elems = l2.select(
        *base, "page_no", "block_no", "block_type", "elem_path", "flat_para",
        F.when(F.col("block_type") == "TABLE", table_text)
        .otherwise(F.concat_ws(SEP_PARAGRAPH, F.transform(F.col("parts"), lambda x: x.t)))
        .alias("elem_text"),
    )

    # L3: elements -> block, ordered by the elem_path suffix after
    # the top block ordinal (lexicographic array order = DFS order).
    # Flat elements (NULL stored path) get their derivable suffix
    # [para_no] built HERE — element-level rows only, never per word.
    suffix = F.when(
        F.col("elem_path").isNull(), F.array(F.col("flat_para"))
    ).otherwise(F.slice(F.col("elem_path"), 2, F.size("elem_path") - 1))
    return (
        elems.groupBy(*base, "page_no", "block_no")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(suffix.alias("o"), F.col("elem_text").alias("t"), F.col("block_type").alias("bt"))
                )
            ).alias("elems"),
            # top block's type = the type of its MINIMAL-DEPTH element
            # (first in document order among the block's own direct
            # elements) — NOT the DFS-first entry: a container whose
            # first child is a nested HEADING/TABLE block sorts that
            # child's element first lexicographically and would
            # mislabel the whole block (chunk_layout's heading
            # carry-forward would then treat the container as a
            # heading)
            F.min_by(
                F.col("block_type"), F.struct(F.size(suffix).alias("d"), suffix.alias("s"))
            ).alias("block_type"),
        )
        .select(
            *base, "page_no", "block_no", "block_type",
            F.array_join(F.transform(F.col("elems"), lambda x: x.t), SEP_BLOCK).alias("block_text"),
        )
    )


def table_records(spans: DataFrame) -> DataFrame:
    """Reference ``Table.as_dataframe()`` analog (ocr_schema.py:
    300-322, pandas DataFrame with the header row as columns) —
    relational form: one output ROW per table BODY row, cells as a
    ``map<column_name, cell_text>``. Column names come from the
    HEADER row when present (``Table.header`` is Optional), else
    positional ``c0..cN``. At 10^12 docs a table becomes rows in a
    DataFrame, never a driver-side frame.

    Output: (url, engine, page_no, block_no, table_no, row_no,
    record map<string,string>).
    """
    base = ["url", "engine", "page_no", "block_no", "elem_path", "table_no"]
    table_spans = spans.filter(F.col("block_type") == "TABLE")
    cells = _ordered_concat(
        table_spans,
        base + ["row_no", "column_no", "row_type"],
        F.struct(F.col("para_no").alias("p"), F.col("word_no").alias("w")),
        "text", SEP_LINE, "cell_text",
    )
    per_table = cells.groupBy(*base).agg(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("row_type") == "HEADER",
                    F.struct(F.col("column_no").alias("o"), F.col("cell_text").alias("t")),
                )
            )
        ).alias("headers"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("row_type") == "BODY",
                    F.struct(
                        F.struct(F.col("row_no").alias("r"), F.col("column_no").alias("c")).alias("o"),
                        F.col("cell_text").alias("t"),
                    ),
                )
            )
        ).alias("body_cells"),
    )
    rows = per_table.select(
        *base,
        "headers",
        F.explode(
            F.transform(
                F.array_distinct(F.transform(F.col("body_cells"), lambda x: x.o.r)),
                lambda r: F.struct(
                    r.alias("row_no"),
                    F.filter(F.col("body_cells"), lambda x: x.o.r == r).alias("cells"),
                ),
            )
        ).alias("row"),
    )
    name_of = lambda c, i: F.coalesce(  # noqa: E731
        # try_element_at: headerless tables have an EMPTY headers
        # array (ANSI element_at throws on it)
        F.try_element_at(F.col("headers"), (c + 1).cast("int")).t,
        F.concat(F.lit("c"), c.cast("string")),
    )
    record = F.map_from_entries(
        F.transform(
            F.col("row.cells"),
            lambda x, i: F.struct(name_of(x.o.c, i).alias("k"), x.t.alias("v")),
        )
    )
    return rows.select(
        "url", "engine", "page_no", "block_no", "table_no",
        F.col("row.row_no").alias("row_no"),
        record.alias("record"),
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
