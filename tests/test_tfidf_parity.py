"""Rank-identity: the distributed TF-IDF pipeline vs the sequential oracle.

This is the engine analog of the reference's golden top-20 fixtures
(/root/reference/test/test_gui_main.py:148-204,236-292): for synthetic corpus
documents, the Spark plan's ranked term list must equal the pure-Python
reference-semantics oracle exactly — scores to 1e-9, ranks identical,
under every filter-flag combination."""

import math

import pytest

from words_in_context_spark.corpus import generate_pages
from words_in_context_spark.pyoracle import CorpusOracle
from words_in_context_spark.textparse import extract_and_tokenize

N_DOCS = 24
SEED = 1234


@pytest.fixture(scope="module")
def pages():
    return generate_pages(N_DOCS, seed=SEED)


@pytest.fixture(scope="module")
def oracle(pages):
    orc = CorpusOracle()
    for p in pages:
        orc.add(p["url"], p["text"], lang=p["lang"])
    return orc


@pytest.fixture(scope="module")
def spark_tokens(spark, pages):
    from words_in_context_spark.operators.extract import tokenize

    docs = spark.createDataFrame(
        [(p["url"], p["text"], p["lang"]) for p in pages],
        "url string, text string, lang string",
    )
    toks = tokenize(docs)
    toks.cache().count()
    return toks


def _spark_ranking(spark_tokens, url, **flags):
    from pyspark.sql import functions as F

    from words_in_context_spark.plans.tfidf import doc_word_scores

    rows = (
        doc_word_scores(spark_tokens, **flags)
        .where(F.col("url") == url)
        .orderBy("rank")
        .collect()
    )
    return [(r.term, r.score, r.tf, r.doc_len, r.df) for r in rows]


@pytest.mark.parametrize(
    "flags",
    [
        {},
        {"name_filtering": True},
        {"deprioritize_sound_desc": True},
        {"name_filtering": True, "deprioritize_sound_desc": True},
    ],
    ids=["plain", "names", "sound", "both"],
)
def test_rank_identity_vs_oracle(spark_tokens, oracle, pages, flags):
    for p in pages[:6]:
        url = p["url"]
        expected = oracle.doc_word_stats(url, **flags)
        got = _spark_ranking(spark_tokens, url, **flags)
        assert len(got) == len(expected)
        for i, (g, e) in enumerate(zip(got, expected)):
            term, score, tf, doc_len, df = g
            assert term == e.term, f"rank {i+1}: {term} != {e.term} ({url})"
            assert tf == e.count and doc_len == e.doc_len and df == e.df
            assert math.isclose(score, e.score, rel_tol=1e-9, abs_tol=1e-12)


def test_token_streams_identical(spark_tokens, pages):
    """The UDF must emit exactly the pure-Python token stream per document."""
    got = {
        (r.url, r.tok_idx): (r.line_id, r.pos, r.term, r.is_namecase, r.in_sound_desc)
        for r in spark_tokens.collect()
    }
    total = 0
    for p in pages:
        doc = extract_and_tokenize(p["text"], lang=p["lang"])
        for i, t in enumerate(doc.tokens):
            assert got[(p["url"], i)] == (
                t.line_id,
                t.pos,
                t.term,
                t.is_namecase,
                t.in_sound_desc,
            )
            total += 1
    assert total == len(got)


def test_corpus_deterministic():
    a = generate_pages(5, seed=99)
    b = generate_pages(5, seed=99)
    assert [(p["url"], p["text"]) for p in a] == [(p["url"], p["text"]) for p in b]
    c = generate_pages(5, seed=100)
    assert [p["text"] for p in a] != [p["text"] for p in c]
