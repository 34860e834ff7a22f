"""Phrase search (operators/phrase.py): exact token-adjacency matching."""

import pytest
from pyspark.sql import functions as F

from words_in_context_spark.operators.extract import tokenize_simple
from words_in_context_spark.operators.phrase import phrase_count, phrase_matches


@pytest.fixture(scope="module")
def toks(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox the quick fox"),
            (2, "quick the brown"),
            (3, "a a a a"),
            (4, "THE, quick... brown!"),  # punctuation between words is fine
        ],
        "doc_id long, text string",
    )
    return tokenize_simple(docs).cache()


def _m(df):
    return {(r["doc_id"], r["start_pos"]) for r in df.collect()}


def test_bigram_matches(toks):
    assert _m(phrase_matches(toks, ["the", "quick"])) == {
        (1, 0), (1, 4), (4, 0),
    }
    assert _m(phrase_matches(toks, ["quick", "fox"])) == {(1, 5)}


def test_trigram_and_order_sensitivity(toks):
    assert _m(phrase_matches(toks, ["the", "quick", "brown"])) == {
        (1, 0), (4, 0),
    }
    # doc 2 has the words but not in phrase order
    assert not _m(phrase_matches(toks, ["the", "quick"])) & {(2, 0), (2, 1)}


def test_overlapping_matches(toks):
    # "a a a a": the bigram (a, a) occurs at starts 0,1,2
    assert _m(phrase_matches(toks, ["a", "a"])) == {(3, 0), (3, 1), (3, 2)}


def test_phrase_count(toks):
    counts = {r["doc_id"]: r["n_matches"] for r in phrase_count(toks, ["the", "quick"]).collect()}
    assert counts == {1: 2, 4: 1}


def test_empty_phrase_rejected(toks):
    with pytest.raises(ValueError):
        phrase_matches(toks, [])
