"""Property-based checks of text/hash operators against plain-Python
models, over randomized corpora (hypothesis) — covers input shapes the
fixture never produces (empty strings, single chars, repeated words,
unicode-free edge chars)."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from file_scraper_spark.operators.text import FP_MOD, TOKEN_RE

word = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
doc = st.lists(word, min_size=0, max_size=12).map(" ".join)


def py_fingerprint(text: str) -> int:
    acc = 0
    for ch in text:
        acc = (acc * 31 + ord(ch)) % FP_MOD
    return acc


@pytest.fixture(scope="module")
def text_frame(spark):
    """One reusable evaluator: doc text -> (fingerprint, token counts)."""
    from pyspark.sql import functions as F

    def run(texts: list[str]):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        codes = F.transform(
            F.split(F.col("text"), ""), lambda c: F.ascii(c).cast("long")
        )
        out = df.select(
            "doc_id",
            F.aggregate(
                codes, F.lit(0).cast("long"),
                lambda acc, c: (acc * 31 + c) % F.lit(FP_MOD),
            ).alias("fp"),
            F.size(F.split("text", " ")).alias("n_ws"),
            F.size(
                F.regexp_extract_all("text", F.lit(TOKEN_RE), F.lit(0))
            ).alias("n_re"),
        ).collect()
        return {r.doc_id: (r.fp, r.n_ws, r.n_re) for r in out}

    return run


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(st.lists(doc, min_size=1, max_size=8))
def test_fingerprint_and_tokens_match_python(text_frame, texts):
    got = text_frame(texts)
    for i, t in enumerate(texts):
        fp, n_ws, n_re = got[i]
        assert fp == py_fingerprint(t), f"fingerprint mismatch on {t!r}"
        assert n_ws == len(t.split(" ")), f"ws tokens mismatch on {t!r}"
        assert n_re == len(re.findall(TOKEN_RE, t)), f"re tokens on {t!r}"
