"""Comparison-report JSON matches the reference fixture shape
(FIXTURES.md §6 / examples/ocr_comparison.py:244-259)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ocr_compare_spark import synth
from ocr_compare_spark.operators.compare import pairwise_compare
from ocr_compare_spark.operators.extract import run_engines_fused
from ocr_compare_spark.plans.report import report_rows


@pytest.fixture(scope="module")
def report(spark, sf_dir):
    pages = synth.pages_from_documents(spark, sf_dir).limit(30)
    res = run_engines_fused(pages, with_spans=False).cache()
    cmp_df = pairwise_compare(res, with_alignment=False)
    return report_rows(res, cmp_df).collect()


def test_report_fixture_shape(report):
    assert report
    r = json.loads(report[0].report)
    assert set(r) == {"comparison", "text_analysis", "text_samples"}
    assert set(r["comparison"]) == {"text_extraction", "confidence_scores"}
    assert set(r["text_analysis"]) == {"stats", "similarities"}
    for eng, stats in r["text_analysis"]["stats"].items():
        assert set(stats) == {"char_count", "word_count", "line_count"}
    for eng, text in r["comparison"]["text_extraction"].items():
        assert isinstance(text, str)


def test_report_similarity_keys(report):
    html_reports = [json.loads(x.report) for x in report]
    keyed = [r for r in html_reports if r["text_analysis"]["similarities"]]
    assert keyed
    assert all(
        list(r["text_analysis"]["similarities"]) == ["density_vs_dom"] for r in keyed
    )


def test_report_sample_truncation(spark):
    """>1000-char docs get the '...'-suffixed 1000-char sample
    (ocr_comparison.py:253-257)."""
    long_text = " ".join(f"w{i}" for i in range(600))
    pages = spark.createDataFrame(
        [(synth.url_of(4), None, synth.build_html(4, long_text), long_text, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    res = run_engines_fused(pages, with_spans=False)
    cmp_df = pairwise_compare(res, with_alignment=False)
    r = json.loads(report_rows(res, cmp_df).first().report)
    sample = r["text_samples"]["dom"]
    assert len(sample) == 1003 and sample.endswith("...")
    assert r["comparison"]["text_extraction"]["dom"] == synth.expected_dom_text(long_text, 4)
