"""Linear quality classifier (multinomial Naive Bayes) — the
"fastText quality filter" stage of CCNet / GPT-3 / RefinedWeb-style
pipelines: train on a high-quality reference corpus (positive) vs
random crawl (negative), then keep pages the model scores positive.

NB with Laplace smoothing IS a linear text classifier (per-token
log-odds weights + a prior bias), which is exactly the shape the
published pipelines use — and unlike logistic regression it trains
in ONE distributed counting pass, no iterations.

Spark shape (same scale story as operators/lm.py):

- **train**: one union + ONE map-side-combined ``groupBy(token)``
  over both corpora; totals and vocab size attach via broadcast
  1-row aggregates (fully lazy, no driver collect); optional vocab
  cap is a distributed top-K with a deterministic (cnt desc, token
  asc) tie-break. The model is a ``(token, weight)`` table with the
  OOV weight and prior bias riding along as replicated columns
  (lm.py's ``total`` convention).
- **score**: broadcast model join on the exploded token stream +
  map-side-combined regroup — only (id, weight) slim rows shuffle.
  Plan is O(1) in vocab size.

Determinism contract: weights are ``round6``-ed BEFORE summation
(floor(x*1e6+0.5)/1e6 — lm.py's cross-engine rounding), so scores
are exact sums of 6-decimal terms and the pure-Python mirror
(tests) reproduces them bit-for-bit.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, DataFrame, functions as F

from ocr_compare_spark.operators.lm import _round6, _tokens

#: Laplace smoothing pseudo-count per (token, class).
DEFAULT_ALPHA = 0.5


def train_nb(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
    vocab_size: int | None = None,
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """Train on two corpora -> model table
    ``(token, c_pos, c_neg, weight, w_oov, bias)`` where

    - ``weight = round6(ln((c_pos+a)/(N_pos+a(V+1)))
                 - ln((c_neg+a)/(N_neg+a(V+1))))``
    - ``w_oov`` is the same with c=0 (the +1 in the denominator IS
      the OOV bucket),
    - ``bias = round6(ln(docs_pos / docs_neg))`` (class prior),
    - ``N_*`` are FULL per-class token totals (pre-cap, lm.py
      convention: capping changes what is OOV, not in-vocab weights),
    - ``V`` is the post-cap vocab size.
    """
    a = float(alpha)
    labeled = pos.select(
        F.explode(_tokens(text_col)).alias("token"), F.lit(1).alias("y")
    ).unionByName(
        neg.select(F.explode(_tokens(text_col)).alias("token"), F.lit(0).alias("y"))
    )
    counts = labeled.groupBy("token").agg(
        F.sum("y").alias("c_pos"),
        (F.count("*") - F.sum("y")).alias("c_neg"),
    )
    totals = counts.agg(
        F.sum("c_pos").alias("n_pos"), F.sum("c_neg").alias("n_neg")
    )
    if vocab_size is not None:
        counts = counts.orderBy(
            F.desc(F.col("c_pos") + F.col("c_neg")), F.asc("token")
        ).limit(vocab_size)
    vsize = counts.agg(F.count("*").alias("v"))
    priors = pos.agg(F.count("*").alias("docs_pos")).crossJoin(
        neg.agg(F.count("*").alias("docs_neg"))
    )

    def _lodds(cp: Column, cn: Column) -> Column:
        dp = F.col("n_pos") + a * (F.col("v") + 1)
        dn = F.col("n_neg") + a * (F.col("v") + 1)
        return _round6(F.log((cp + a) / dp) - F.log((cn + a) / dn))

    return (
        counts.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(vsize))
        .crossJoin(F.broadcast(priors))
        .select(
            "token",
            "c_pos",
            "c_neg",
            _lodds(F.col("c_pos"), F.col("c_neg")).alias("weight"),
            _lodds(F.lit(0), F.lit(0)).alias("w_oov"),
            _round6(F.log(F.col("docs_pos") / F.col("docs_neg"))).alias("bias"),
        )
    )


def score_nb(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents -> ``(id_col, n_tokens, n_oov, nb_score,
    nb_label)`` where ``nb_score = round6(bias + sum(weight_i))``
    (OOV tokens contribute ``w_oov``) and ``nb_label = score > 0``.
    Broadcast model join; only slim rows shuffle."""
    meta = F.broadcast(model.select("w_oov", "bias").limit(1))
    toks = df.select(F.col(id_col), F.explode(_tokens(text_col)).alias("token"))
    joined = toks.join(
        F.broadcast(model.select("token", "weight")), "token", "left"
    ).crossJoin(meta)
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("weight").isNull(), 1).otherwise(0)).alias("n_oov"),
            _round6(
                F.first("bias") + F.sum(F.coalesce(F.col("weight"), F.col("w_oov")))
            ).alias("nb_score"),
        )
        .withColumn("nb_label", F.col("nb_score") > 0)
    )


# ---------------------------------------------------------------------------
# Pure-Python mirror (tests pin Spark == mirror bit-for-bit)

def _py_tokens(text: str) -> list[str]:
    """Spark ``F.split(_, '\\s+')`` semantics (limit -1): BOTH leading
    and trailing empty tokens are kept — ``'a b '`` tokenizes to
    ``['a', 'b', '']`` on both sides (review r5: the mirror previously
    dropped trailing empties, diverging on trailing whitespace)."""
    return re.split(r"\s+", text)


def _r6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def train_nb_py(
    pos_texts: list[str],
    neg_texts: list[str],
    vocab_size: int | None = None,
    alpha: float = DEFAULT_ALPHA,
) -> dict:
    """Mirror of train_nb: returns {'weights': {token: w}, 'w_oov',
    'bias'} under the identical smoothing/cap/rounding contract."""
    cp: dict[str, int] = {}
    cn: dict[str, int] = {}
    for t in pos_texts:
        for w in _py_tokens(t):
            cp[w] = cp.get(w, 0) + 1
    for t in neg_texts:
        for w in _py_tokens(t):
            cn[w] = cn.get(w, 0) + 1
    vocab = sorted(set(cp) | set(cn))
    n_pos, n_neg = sum(cp.values()), sum(cn.values())
    if vocab_size is not None:
        vocab = sorted(
            vocab, key=lambda w: (-(cp.get(w, 0) + cn.get(w, 0)), w)
        )[:vocab_size]
    v = len(vocab)
    dp = n_pos + alpha * (v + 1)
    dn = n_neg + alpha * (v + 1)

    def lodds(p: int, n: int) -> float:
        return _r6(math.log((p + alpha) / dp) - math.log((n + alpha) / dn))

    return {
        "weights": {w: lodds(cp.get(w, 0), cn.get(w, 0)) for w in vocab},
        "w_oov": lodds(0, 0),
        "bias": _r6(math.log(len(pos_texts) / len(neg_texts))),
    }


def score_nb_py(text: str, model: dict) -> tuple[int, int, float, bool]:
    toks = _py_tokens(text)
    n_oov = sum(1 for w in toks if w not in model["weights"])
    s = _r6(
        model["bias"]
        + sum(model["weights"].get(w, model["w_oov"]) for w in toks)
    )
    return len(toks), n_oov, s, s > 0


# ---------------------------------------------------------------------------
# Logistic regression over hashed text features (the GPT-3 recipe)
#
# GPT-3's Common Crawl filter was literally "a logistic regression
# classifier" over text features, reference corpus = positive, raw
# crawl = negative (Brown et al. 2020, App. A) — NB above covers the
# one-pass fastText/CCNet shape; this is the iterative discriminative
# counterpart, trained fully inside the engine.
#
# Shape per GD iteration (full-batch, deterministic):
# - features x = unsigned hashed-TF vector (embedding.hashed_tf,
#   signed=False) — vocabulary-free, fixed dim; scaled by the doc's
#   token count ONCE, after the dot (z = b + dot(w, v)/n), so the
#   per-element lambda never references an expression-backed scalar
#   (the CLAUDE.md lambda-inline trap).
# - per-doc gradient components round6'd to INT64 MICROUNITS before
#   the cross-doc sum (the lm.py round-before-sum contract), so the
#   aggregated gradient — and therefore every subsequent weight
#   vector — is partition/layout/cluster-size invariant and the
#   pure-python mirror reproduces training BIT-FOR-BIT.
# - the gradient aggregation is a posexplode + ONE map-side-combined
#   groupBy(slot): (dim+1) slim (slot, g6) rows per doc, no lambda
#   over expression-backed columns, no driver-side data beyond the
#   (dim+1)-row sums. The bias rides slot 0 with v = n, so its
#   "scaled" component (e*n)/n IS the error term under the shared
#   formula (one code path for all slots).
# - weight update runs on the driver through ONE shared function
#   (_logreg_update) that the mirror calls too — the lloyd_kmeans
#   shared-loop convention.


def _logreg_z(vec_col: str, wb: list[float], n_col: str | None = None) -> Column:
    """z = b + dot(w, v)/n with the dot folded in INDEX order and n =
    sum(v) (exact integers; pass a precomputed ``n_col`` to skip the
    fold — the training loop hoists it, review finding) — one
    division AFTER the fold, so the mirror's float op sequence
    matches exactly."""
    warr = F.array(*[F.lit(float(x)) for x in wb[1:]])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), warr, lambda v, w: w * v),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if n_col is not None:
        n = F.col(n_col)
    else:
        n = F.aggregate(F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x)
    return F.lit(float(wb[0])) + dot / n


def _logreg_update(
    wb: list[float], sums6: list[int], n_docs: int, lr: float
) -> list[float]:
    """Shared driver-side GD step (Spark trainer AND mirror): wb −=
    lr · (Σg6/1e6)/n_docs per slot."""
    return [w - lr * (s / 1e6) / n_docs for w, s in zip(wb, sums6)]


def train_logreg(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
    dim: int = 64,
    iters: int = 30,
    lr: float = 2.0,
    num_partitions: int | None = None,
) -> dict:
    """Train the LR quality classifier: reference corpus (positive)
    vs raw crawl sample (negative). Returns {'wb': [bias, w_0..],
    'dim': dim} — ``wb`` is bit-deterministic (see module notes).

    Blank/whitespace-only docs contribute nothing (hashed_tf's
    no-row contract). iters jobs run, each collecting (dim+1) int64
    sums — the only driver traffic."""
    from ocr_compare_spark.operators.embedding import hashed_tf

    labeled = (
        pos.select(F.col(text_col).alias("text")).withColumn("y", F.lit(1.0))
        .unionByName(
            neg.select(F.col(text_col).alias("text")).withColumn("y", F.lit(0.0))
        )
        .withColumn("_id", F.monotonically_increasing_id())
        .localCheckpoint()  # freeze ids: hashed_tf AND the y join read them
    )
    feats = (
        hashed_tf(labeled, "_id", "text", dim=dim, signed=False,
                  num_partitions=num_partitions)
        .join(labeled.select("_id", "y"), "_id")
        .select(
            "y",
            "vector",
            # loop-invariant token count hoisted ONCE into the
            # checkpointed frame (the loop used to re-fold it three
            # times per row per iteration — review finding); exact
            # integer sum, so the value is bit-identical to the fold
            F.aggregate(
                F.col("vector"), F.lit(0.0), lambda acc, x: acc + x
            ).alias("_n"),
        )
        .localCheckpoint()  # reused by EVERY iteration
    )
    n_docs = feats.count()
    if n_docs == 0:
        raise ValueError("train_logreg: no non-empty documents")
    wb = [0.0] * (dim + 1)
    for _ in range(iters):
        # r6 optimization: the former per-iteration Spark job built
        # an interpreted zip_with/aggregate fold per row plus a
        # posexplode of (dim+1) slim rows per doc — ~3 s/iteration at
        # sf1.0. This Arrow pass computes the SAME float ops in the
        # SAME order (z fold per dimension index, err via math.exp —
        # the libm exp the JVM shares on this box, the recrawl
        # precedent the mirror already relies on; g6 floor-round6 per
        # slot) and emits one (dim+1)-row int64 partial sum per
        # partition; int64 sums are order-free, so the aggregated
        # gradient — and every weight vector — stays bit-identical to
        # the mirror (pytest-pinned).
        rows = (
            feats.mapInPandas(
                _grad_partials(wb, dim), "slot int, s6 long"
            )
            .groupBy("slot")
            .agg(F.sum("s6").alias("s6"))
            .collect()
        )
        sums = [0] * (dim + 1)
        for r in rows:
            sums[r["slot"]] = r["s6"]
        wb = _logreg_update(wb, sums, n_docs, lr)
    return {"wb": wb, "dim": dim}


def _grad_partials(wb: list[float], dim: int):
    """Per-partition gradient partial sums for train_logreg — a pure
    function factory so the closure ships only (wb, dim). Replicates
    the former Spark expression chain bit-for-bit:

        z  = b + (fold_j w_j * v_j) / n      (index-ordered fold)
        e  = 1.0 / (1.0 + exp(-z)) - y       (scalar libm exp)
        g6 = floor(((e * v) / n) * 1e6 + 0.5)  per slot (slot 0: v=n)

    and yields (slot, partial int64 sum) rows."""
    import numpy as np
    import pandas as pd

    b0 = float(wb[0])
    warr = [float(x) for x in wb[1:]]

    def _exp(v: float) -> float:
        # JVM exp saturates to +Infinity; math.exp raises instead
        try:
            return math.exp(v)
        except OverflowError:
            return float("inf")

    def part(batches):
        acc = np.zeros(dim + 1, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["vector"]],
                dtype=np.float64,
            )
            n = pdf["_n"].to_numpy(dtype=np.float64)
            y = pdf["y"].to_numpy(dtype=np.float64)
            dot = np.zeros(len(V), dtype=np.float64)
            for j in range(dim):
                dot = dot + warr[j] * V[:, j]
            z = b0 + dot / n
            e = np.array(
                [1.0 / (1.0 + _exp(-zi)) for zi in z], dtype=np.float64
            ) - y
            acc[0] += np.floor((e * n) / n * 1e6 + 0.5).astype(np.int64).sum()
            for j in range(dim):
                acc[j + 1] += (
                    np.floor((e * V[:, j]) / n * 1e6 + 0.5).astype(np.int64).sum()
                )
        yield pd.DataFrame({"slot": np.arange(dim + 1, dtype=np.int32), "s6": acc})

    return part


def logreg_scores(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_partitions: int | None = None,
) -> DataFrame:
    """Score docs with a trained model -> (id_col, p6, keep): p6 =
    round6(sigmoid(z)) (microunit long), keep = raw p >= threshold.
    Fully native — the model ships as plan literals (dim is small by
    construction; for dim beyond a few hundred, broadcast-join the
    weights instead). Blank docs emit no row (hashed_tf contract)."""
    from ocr_compare_spark.operators.embedding import hashed_tf

    feats = hashed_tf(
        df, id_col, text_col, dim=model["dim"], signed=False,
        num_partitions=num_partitions,
    )
    z = _logreg_z("vector", model["wb"])
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.select(
        F.col(id_col),
        F.floor(p * 1e6 + F.lit(0.5)).cast("long").alias("p6"),
        (p >= F.lit(float(threshold))).alias("keep"),
    )


def train_logreg_py(
    pos_texts: list[str],
    neg_texts: list[str],
    dim: int = 64,
    iters: int = 30,
    lr: float = 2.0,
) -> dict:
    """Pure-python mirror of train_logreg — same feature hash
    (py_hashed_tf unsigned), same index-order dot fold, same
    divide-after-fold z, same per-doc round6-to-int64 gradient slots
    (bias slot 0 with v = n), same shared _logreg_update. Pytest pins
    wb == Spark's bit-for-bit."""
    from ocr_compare_spark.operators.embedding import py_hashed_tf

    docs = []
    for y, texts in ((1.0, pos_texts), (0.0, neg_texts)):
        for t in texts:
            v = py_hashed_tf(t, dim, signed=False)
            if v is not None:
                docs.append((y, v))
    if not docs:
        raise ValueError("train_logreg_py: no non-empty documents")
    wb = [0.0] * (dim + 1)
    for _ in range(iters):
        sums = [0] * (dim + 1)
        for y, v in docs:
            n = 0.0
            for x in v:
                n = n + x
            dot = 0.0
            for w, x in zip(wb[1:], v):
                dot = dot + w * x
            z = wb[0] + dot / n
            e = 1.0 / (1.0 + math.exp(-z)) - y
            for slot, x in enumerate([n] + v):
                sums[slot] += int(math.floor(e * x / n * 1e6 + 0.5))
        wb = _logreg_update(wb, sums, len(docs), lr)
    return {"wb": wb, "dim": dim}


def score_logreg_py(text: str, model: dict, threshold: float = 0.5):
    """Mirror of logreg_scores for one doc (None for blank text)."""
    from ocr_compare_spark.operators.embedding import py_hashed_tf

    v = py_hashed_tf(text, model["dim"], signed=False)
    if v is None:
        return None
    wb = model["wb"]
    n = 0.0
    for x in v:
        n = n + x
    dot = 0.0
    for w, x in zip(wb[1:], v):
        dot = dot + w * x
    z = wb[0] + dot / n
    p = 1.0 / (1.0 + math.exp(-z))
    return int(math.floor(p * 1e6 + 0.5)), p >= threshold
