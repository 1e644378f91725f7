"""Jaro-Winkler: vectorized numpy batch vs pure-Python scalar reference
(FIXTURES.md B5), including hypothesis-generated pairs."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from mediachain_indexer_spark.functions.simtext import (
    jaro_winkler_batch,
    jaro_winkler_ref,
)

KNOWN = [
    ("martha", "marhta", 0.9611),
    ("dixon", "dicksonx", 0.8133),
    ("jellyfish", "smellyfish", 0.8963),
    ("", "", 1.0),
    ("abc", "", 0.0),
    ("abc", "abc", 1.0),
]


def test_known_values():
    got = jaro_winkler_batch(
        pd.Series([a for a, _, _ in KNOWN]), pd.Series([b for _, b, _ in KNOWN])
    )
    for i, (_, _, exp) in enumerate(KNOWN):
        assert abs(got[i] - exp) < 5e-5


text = st.text(alphabet="abcdef 123", max_size=40)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(text, text), min_size=1, max_size=30))
def test_matches_scalar_reference(pairs):
    a = pd.Series([p[0] for p in pairs])
    b = pd.Series([p[1] for p in pairs])
    got = jaro_winkler_batch(a, b)
    for i, (s1, s2) in enumerate(pairs):
        assert abs(got[i] - jaro_winkler_ref(s1, s2)) < 1e-9


def test_symmetry_and_range():
    import random

    rng = random.Random(7)
    strs = ["".join(rng.choice("abcde ") for _ in range(rng.randrange(0, 25))) for _ in range(100)]
    a = pd.Series(strs)
    b = pd.Series(list(reversed(strs)))
    ab = jaro_winkler_batch(a, b)
    ba = jaro_winkler_batch(b, a)
    assert ((ab - ba).abs() < 1e-12).all()
    assert ((ab >= 0) & (ab <= 1)).all()


def test_nulls_treated_as_empty():
    got = jaro_winkler_batch(pd.Series([None, None]), pd.Series([None, "x"]))
    assert got[0] == 1.0 and got[1] == 0.0


def test_filter_unpersisted_scores(spark):
    """Regression (round-1 driver failure er_matches): filtering score_pairs
    output on is_match WITHOUT persisting first must not crash.  Before the
    gated-JW pandas_udf was marked asNondeterministic, CollapseProject inlined
    is_match → text_sim → gated(...) into a pushed-down join filter and
    whole-stage codegen raised INTERNAL_ERROR 'Cannot evaluate expression'."""
    from pyspark.sql import functions as F

    from mediachain_indexer_spark.operators.scoring import score_pairs

    feats = spark.createDataFrame(
        [
            ("a", "the quick brown fox", [1]),
            ("b", "the quick brown fox", [1]),
            ("c", "completely different text", [9999]),
        ],
        "doc_id string, norm_text string, phashes array<long>",
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "doc_a string, doc_b string"
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in score_pairs(pairs, feats).where(F.col("is_match")).collect()
    }
    assert got == {("a", "b")}
