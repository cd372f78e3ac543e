"""Metric-function oracles: numpy DP Levenshtein vs a pure-Python
reference implementation; LCS spans vs difflib (FIXTURES.md §8)."""

from __future__ import annotations

import difflib
import random

import numpy as np

from ocr_compare_spark.operators.compare import _codes, align_metrics, levenshtein_np


def lev_ref(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev, dp[j] = dp[j], cur
    return dp[n]


def test_levenshtein_exact_random():
    rng = random.Random(42)
    alphabet = "abcde"
    for _ in range(200):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        assert levenshtein_np(_codes(a), _codes(b)) == lev_ref(a, b), (a, b)


def test_levenshtein_known_cases():
    cases = [("", "", 0), ("abc", "", 3), ("", "abc", 3), ("abc", "abc", 0),
             ("kitten", "sitting", 3), ("flaw", "lawn", 2), ("abc", "axc", 1)]
    for a, b, d in cases:
        assert levenshtein_np(_codes(a), _codes(b)) == d


def test_align_metrics_semantics():
    m = align_metrics("the cat sat", "the cat sat")
    assert m["cer"] == 0.0 and m["wer"] == 0.0
    assert m["lcs_spans"] == [{"a_start": 0, "a_end": 3, "b_start": 0, "b_end": 3}]
    m = align_metrics("the cat sat", "the dog sat")
    assert m["wer"] == 1 / 3
    assert m["cer"] == 3 / 11


def test_lcs_matches_difflib():
    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    for _ in range(50):
        a = " ".join(rng.choice(words) for _ in range(rng.randint(0, 12)))
        b = " ".join(rng.choice(words) for _ in range(rng.randint(0, 12)))
        got = align_metrics(a, b)["lcs_spans"]
        sm = difflib.SequenceMatcher(None, a.split(), b.split(), autojunk=False)
        exp = [
            {"a_start": mb.a, "a_end": mb.a + mb.size, "b_start": mb.b, "b_end": mb.b + mb.size}
            for mb in sm.get_matching_blocks() if mb.size > 0
        ]
        assert got == exp


def test_unicode_cer():
    assert levenshtein_np(_codes("naïve"), _codes("naive")) == 1
    assert levenshtein_np(_codes("日本語"), _codes("日本")) == 1


def test_wer_token_ids_not_chars():
    # long distinct tokens must count as single edits
    m = align_metrics("internationalization", "localization")
    assert m["wer"] == 1.0
