"""Unigram language-model perplexity scoring (the CCNet family).

CCNet (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") ranks Common-Crawl documents by the
perplexity of a language model and keeps the low-perplexity head.
This module is the Spark-native shape of that stage over the
``documents`` table:

- **train_unigram_lm**: token counts over the corpus -> per-token
  log-probability. One explode + one ``groupBy(token)`` shuffle with
  map-side combine (the shuffle ships ~|vocab| rows per input
  partition, never per-token rows). ``vocab_size`` caps the model to
  the top-K tokens via a distributed top-K (``orderBy().limit()`` —
  TakeOrderedAndProject, NOT a single-partition window), which is the
  100 TB shape: a web-scale vocab has 10^8 types, but the model you
  ship is the capped head plus one OOV mass.

- **perplexity_scores**: per-document token count, OOV count,
  cross-entropy (mean negative log-prob per token) and perplexity.
  Two execution paths, mirroring the ANN literal/data precedent
  (similarity.py):

  * ``method="literal"`` (default, the oracle path): the trained
    vocab is collected to the driver (guarded by
    ``MAX_VOCAB_COLLECT``) and embedded as a map literal; scoring is
    ONE ordered ``aggregate`` fold over the token array — zero
    shuffle, zero join, whole-stage codegen. Summation is strictly
    left-to-right, so a DuckDB twin that folds an ordered list
    reproduces the double bit-for-bit (the `confidences` ordered
    list_sum precedent).
  * ``method="data"`` (the scale path): the vocab stays a DataFrame;
    tokens explode, broadcast-hash-join the vocab, and re-group by
    document with map-side combine. No driver collect, plan size
    O(1) in |vocab|. Each document's exploded tokens stay contiguous
    in one input partition, so the partial aggregate accumulates
    them in token order and the two paths agree bit-for-bit
    (pytest-pinned).

All log-probs are rounded to 6 decimals (HALF_UP via the
floor(x*1e6+0.5)/1e6 trick — CLAUDE.md's Spark/DuckDB float-round
contract) BEFORE any summation, so cross-engine `ln`/`exp` ulp
differences cannot compound: both engines sum identical rounded
doubles in identical order.

Reference anchor: the reference repo has no LM stage (it is an OCR
comparison tool); this operator extends the repo's curation family
(textstats.py quality filters) with the canonical CCNet signal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Driver guard for the literal path: a capped vocab this size is a
#: few MB of plan literals; anything larger must use method="data".
MAX_VOCAB_COLLECT = 65536

#: Probability mass assigned to an out-of-vocabulary token:
#: p_oov = OOV_MASS / total_corpus_tokens (a fixed half-count, the
#: classic "0.5 smoothing" floor).
OOV_MASS = 0.5


def _round6(c: Column) -> Column:
    return F.floor(c * 1e6 + F.lit(0.5)) / 1e6


def _tokens(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, r"\s+")


def train_unigram_lm(
    df: DataFrame, text_col: str = "text", vocab_size: int | None = None
) -> DataFrame:
    """Token counts -> ``(token, cnt, total, logprob)``.

    ``logprob = round6(ln(cnt / total))`` where ``total`` is the FULL
    corpus token count (computed before any vocab cap, so capping
    changes which tokens are OOV but not the in-vocab probabilities).
    ``total`` rides along as a column (same value every row) so
    scorers can derive the OOV log-prob without a second aggregate.

    Entirely lazy — no driver action. The total is attached via a
    broadcast cross join of a 1-row aggregate (a no-shuffle map-side
    attach), and the vocab cap is a distributed top-K ordered by
    (cnt DESC, token ASC) — deterministic under ties.
    """
    from ocr_compare_spark.operators.spread import spread_small_input

    # byte-light compute-heavy tokenize — spread a few-split source
    # (r6; adaptive no-op on adequately-split inputs). Doc rows move
    # BEFORE the explode, so a doc's tokens stay contiguous in one
    # partition (the data-path summation-order contract).
    df = spread_small_input(df)
    counts = (
        df.select(F.explode(_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    if vocab_size is not None:
        counts = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(vocab_size)
    return counts.crossJoin(F.broadcast(total)).select(
        "token",
        "cnt",
        "total",
        _round6(F.log(F.col("cnt") / F.col("total"))).alias("logprob"),
    )


def _oov_logprob_col() -> Column:
    return _round6(F.log(F.lit(OOV_MASS) / F.col("total")))


def perplexity_scores(
    df: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "literal",
) -> DataFrame:
    """Score each document against a trained unigram LM.

    Output: ``(id_col, n_tokens, n_oov, cross_entropy, ppl)`` where
    ``cross_entropy = round6(-sum(logprob_i) / n_tokens)`` and
    ``ppl = round6(exp(cross_entropy))`` (exp of the ROUNDED mean, so
    both engine's exp sees an identical input double).

    method="literal": vocab embedded as a map literal (driver collect
    guarded at MAX_VOCAB_COLLECT); one ordered aggregate fold per
    row, zero shuffle. method="data": broadcast join + one
    map-side-combined groupBy — the 100 TB path.
    """
    from ocr_compare_spark.operators.spread import spread_small_input

    # spread BEFORE the tokenize/fold (r6): doc rows move whole, so
    # per-doc token order — the round6-before-sum contract's
    # summation order — is untouched
    df = spread_small_input(df)
    if method == "literal":
        rows = lm.collect()
        if len(rows) > MAX_VOCAB_COLLECT:
            raise ValueError(
                f"literal LM path needs |vocab| <= {MAX_VOCAB_COLLECT}, got "
                f"{len(rows)}; use method='data'"
            )
        if not rows:
            raise ValueError("empty language model")
        total = rows[0]["total"]
        # Spark-computed logprobs become the literals — the oracle
        # twin recomputes them with DuckDB ln under the same round6.
        pairs: list[Column] = []
        for r in rows:
            pairs.append(F.lit(r["token"]))
            pairs.append(F.lit(float(r["logprob"])))
        lm_map = F.create_map(*pairs)
        toks = _tokens(text_col)
        # Single aggregate fold (sum, oov-count) in one pass over the
        # array — strictly left-to-right summation. One lambda
        # referencing `toks`, so the split is not inlined N times.
        folded = F.aggregate(
            toks,
            F.struct(
                F.lit(0.0).alias("s"), F.lit(0).cast("long").alias("oov")
            ),
            lambda acc, x: F.struct(
                (
                    acc.s
                    + F.coalesce(
                        F.element_at(lm_map, x),
                        _round6(F.log(F.lit(OOV_MASS) / F.lit(float(total)))),
                    )
                ).alias("s"),
                (acc.oov + F.element_at(lm_map, x).isNull().cast("long")).alias(
                    "oov"
                ),
            ),
        )
        n = F.size(toks)
        ce = _round6(-F.col("_f").getField("s") / F.col("n_tokens"))
        return (
            df.select(
                F.col(id_col),
                n.cast("long").alias("n_tokens"),
                folded.alias("_f"),
            )
            .select(
                id_col,
                "n_tokens",
                F.col("_f").getField("oov").alias("n_oov"),
                ce.alias("cross_entropy"),
            )
            .withColumn("ppl", _round6(F.exp(F.col("cross_entropy"))))
        )
    if method != "data":
        raise ValueError(f"unknown method {method!r}")
    exploded = df.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("token")
    )
    scored = exploded.join(F.broadcast(lm), "token", "left")
    # `total` is NULL exactly on OOV rows; re-attach it from the lm's
    # single-row aggregate so the OOV logprob needs no driver value.
    tot = lm.select(F.first("total").alias("total")).limit(1)
    scored = scored.drop("total").crossJoin(F.broadcast(tot))
    per_tok = F.coalesce(F.col("logprob"), _oov_logprob_col())
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.col("logprob").isNull().cast("long")).alias("n_oov"),
        F.sum(per_tok).alias("_s"),
    )
    return agg.select(
        id_col,
        "n_tokens",
        "n_oov",
        _round6(-F.col("_s") / F.col("n_tokens")).alias("cross_entropy"),
    ).withColumn("ppl", _round6(F.exp(F.col("cross_entropy"))))


# ------------------------------------------- bigram / stupid backoff

#: Stupid-backoff discount (Brants et al. 2007, "Large Language
#: Models in Machine Translation" — the web-scale n-gram recipe:
#: no normalized smoothing, just a fixed multiplicative backoff).
BACKOFF_ALPHA = 0.4


def train_bigram_lm(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adjacent-pair counts -> ``(w1, w2, cnt, logprob)`` with
    ``logprob = round6(ln(cnt(w1 w2) / cnt(w1)))`` (the conditional
    MLE — stupid backoff needs no normalization across the backoff
    levels). Pairs come from two shifted array slices (zip_with, the
    repetition_columns shape — no self-join), one groupBy(w1, w2)
    shuffle with map-side combine, then a broadcast join against the
    unigram counts for the denominator."""
    toks = _tokens(text_col)
    n_pairs = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, n_pairs),
        F.slice(toks, 2, n_pairs),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    counts = (
        df.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt"))
    )
    uni = (
        df.select(F.explode(toks).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("_c1"))
    )
    return counts.join(F.broadcast(uni), "w1").select(
        "w1", "w2", "cnt", _round6(F.log(F.col("cnt") / F.col("_c1"))).alias("logprob")
    )


def bigram_scores(
    df: DataFrame,
    bigram: DataFrame,
    unigram: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Stupid-backoff bigram cross-entropy per document.

    Per-token score (all components round6'd BEFORE any summation,
    the lm.py determinism contract):
    - first token: its unigram logprob (OOV mass for unseen);
    - seen bigram (w_{i-1}, w_i): the conditional logprob;
    - unseen bigram: round6(round6(ln(0.4)) + unigram logprob).

    Pure data path (the web-scale shape): pair explode -> broadcast
    join of the bigram and unigram tables -> one map-side-combined
    regroup per doc. No driver collect anywhere; plan size O(1) in
    both vocab sizes. Output: ``(id_col, n_tokens, n_bigram_hits,
    cross_entropy, ppl)``.
    """
    ln_alpha = F.floor(
        F.log(F.lit(BACKOFF_ALPHA)) * 1e6 + F.lit(0.5)
    ) / 1e6  # constant-folded
    toks = _tokens(text_col)
    n = F.size(toks)
    # (prev, tok) rows; the first token gets prev = NULL (never joins
    # the bigram table, so it scores by its unigram logprob)
    pairs = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.struct(
            F.when(i > 1, F.element_at(toks, i - 1)).alias("w1"),
            F.element_at(toks, i).alias("w2"),
        ),
    )
    ex = df.select(F.col(id_col), n.alias("_n"), F.explode(pairs).alias("p")).select(
        id_col, "_n", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    bi = bigram.select("w1", "w2", F.col("logprob").alias("_bi_lp"))
    un = unigram.select(
        F.col("token").alias("w2"), F.col("logprob").alias("_uni_lp")
    )
    tot = unigram.select(F.first("total").alias("total")).limit(1)
    scored = (
        ex.join(F.broadcast(bi), ["w1", "w2"], "left")
        .join(F.broadcast(un), "w2", "left")
        .crossJoin(F.broadcast(tot))
    )
    uni_or_oov = F.coalesce(F.col("_uni_lp"), _oov_logprob_col())
    per_tok = F.when(F.col("_bi_lp").isNotNull(), F.col("_bi_lp")).otherwise(
        F.when(F.col("w1").isNull(), uni_or_oov).otherwise(
            _round6(ln_alpha + uni_or_oov)
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.first("_n").alias("n_tokens"),
        F.sum(F.col("_bi_lp").isNotNull().cast("long")).alias("n_bigram_hits"),
        F.sum(per_tok).alias("_s"),
    )
    return agg.select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "n_bigram_hits",
        _round6(-F.col("_s") / F.col("n_tokens")).alias("cross_entropy"),
    ).withColumn("ppl", _round6(F.exp(F.col("cross_entropy"))))


# ------------------------------------------- CCNet corpus bucketing

def ce_buckets(
    scores: DataFrame,
    strata_col: str = "lang",
    ce_col: str = "cross_entropy",
    bucket_col: str = "ce_bucket",
) -> DataFrame:
    """CCNet's head/middle/tail split: per stratum (language), bucket
    documents by cross-entropy TERCILES — ``head`` = the most
    reference-like third, the slice CCNet ships as its highest
    quality tier.

    One tiny aggregate (exact interpolated ``percentile`` per
    stratum — #strata rows) broadcast back onto the scores; the
    cutoffs are round6-ed so the comparison happens on the same
    6-decimal grid as the scores themselves (lm.py's cross-engine
    rounding contract). Fully lazy, zero extra shuffles on the
    score stream."""
    cuts = scores.groupBy(strata_col).agg(
        _round6(F.expr(f"percentile({ce_col}, 1.0D/3.0D)")).alias("_t1"),
        _round6(F.expr(f"percentile({ce_col}, 2.0D/3.0D)")).alias("_t2"),
    ).withColumnRenamed(strata_col, "_s")
    bucket = (
        F.when(F.col(ce_col) <= F.col("_t1"), F.lit("head"))
        .when(F.col(ce_col) <= F.col("_t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    # null-safe stratum match: a NULL stratum is a legal groupBy group
    # (same rule as token_budget_sample_bucketed — a plain join key
    # would silently drop those docs unlabeled)
    return (
        scores.join(F.broadcast(cuts), F.col(strata_col).eqNullSafe(F.col("_s")))
        .withColumn(bucket_col, bucket)
        .drop("_s", "_t1", "_t2")
    )


def paragraph_ppl_filter(
    df: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_cross_entropy: float = 10.0,
    sep: str = "\n\n",
) -> DataFrame:
    """CCNet's REAL granularity: score every PARAGRAPH against the
    LM and drop the high-cross-entropy ones, reassembling each
    document's survivors in order — a page is usually good prose
    wrapped in junk (nav, footers, tag clouds), so paragraph-level
    filtering keeps documents a doc-level CE gate would lose whole.

    Per-paragraph CE follows the exact doc-level contract
    (``round6(-sum(round6 logprob)/n)``, OOV = the lm's fixed
    half-count mass), so a paragraph scores identically here and as
    a standalone document under :func:`perplexity_scores` —
    pytest-pinned. Whitespace-only paragraphs are separator
    artifacts: kept unconditionally (paragraph_dedup's blank rule).

    Scale shape: TWO shuffles, no join-back — the token stream
    broadcast-joins the lm (map-side), the score aggregation GROUPS
    BY (id, pos, para) so the paragraph text rides the partial
    aggregate once, and the survivors shuffle once more for the
    ordered per-document reassembly.

    Output: ``(id, text, n_paras, n_dropped)``.
    """
    paras = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), F.lit(sep), -1)).alias("pos", "para"),
    ).withColumn(
        # whole-class whitespace test: F.trim strips only 0x20, so a
        # tab/CR-only paragraph would otherwise score as OOV junk and
        # be dropped instead of kept as a separator artifact
        "is_blank", F.col("para").rlike(r"^\s*$")
    )
    toks = paras.select(
        "id", "pos", "para", "is_blank", F.explode(_tokens("para")).alias("token")
    )
    tot = lm.select(F.first("total").alias("total")).limit(1)
    scored = (
        toks.join(F.broadcast(lm.select("token", "logprob")), "token", "left")
        .crossJoin(F.broadcast(tot))
    )
    agg = scored.groupBy("id", "pos", "para", "is_blank").agg(
        F.count("*").alias("_n"),
        F.sum(F.coalesce(F.col("logprob"), _oov_logprob_col())).alias("_s"),
    )
    ce = _round6(-F.col("_s") / F.col("_n"))
    flagged = agg.withColumn(
        "keep", F.col("is_blank") | (ce <= max_cross_entropy)
    )
    return flagged.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct(F.col("pos"), F.col("para")))
                    )
                ),
                lambda s: s.para,
            ),
            sep,
        ).alias("text"),
        F.count("*").alias("n_paras"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("n_dropped"),
    )
