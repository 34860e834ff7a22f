"""The product query (ranked words + examples) and its integrity property:
every example line must contain the ranked term after tokenization —
the engine twin of the reference's randomized posting-list integrity test
(/root/reference/test/test_gui_examples.py:53-103)."""

import random

import pytest
from pyspark.sql import functions as F

from words_in_context_spark.corpus import generate_pages
from words_in_context_spark.plans.wordscontext import top_words_with_examples
from words_in_context_spark.textparse import tokenize_lines

N_DOCS = 16
SEED = 555


@pytest.fixture(scope="module")
def docs_df(spark):
    pages = generate_pages(N_DOCS, seed=SEED)
    return spark.createDataFrame(
        [(p["url"], p["text"], p["lang"]) for p in pages],
        "url string, text string, lang string",
    ).cache()


def test_examples_contain_term(spark, docs_df):
    rng = random.Random(7)
    urls = [r["url"] for r in docs_df.select("url").collect()]
    for url in rng.sample(urls, 3):
        lang = url.split("/")[3]
        rows = top_words_with_examples(docs_df, url, k=10).collect()
        assert len(rows) == 10
        assert [r["rank"] for r in rows] == list(range(1, 11))
        for r in rows:
            assert r["examples"], f"no examples for {r['term']} in {url}"
            for ex in r["examples"]:
                line_terms = {
                    t.term for t in tokenize_lines([ex["line"]], lang=lang).tokens
                }
                assert r["term"] in line_terms, (
                    f"example line {ex['line_id']} lacks term {r['term']}"
                )


def test_filter_toggle_rescore_without_reextract(spark, docs_df):
    """The reference memoizes the corpus and re-scores on filter toggles
    (gui.py:680-708). Engine twin: pass the same cached tokens, flip flags,
    expect different rankings from the same token DataFrame."""
    from words_in_context_spark.operators.extract import tokenize

    tokens = tokenize(docs_df).cache()
    tokens.count()
    url = docs_df.select("url").first()["url"]
    base = top_words_with_examples(docs_df, url, k=15, tokens=tokens).collect()
    filt = top_words_with_examples(
        docs_df, url, k=15, tokens=tokens, name_filtering=True
    ).collect()
    assert [r["term"] for r in base] != [] and len(filt) == 15
    # name-filtered ranking zeroes likely names: any name-cased-only term with
    # >=2 occurrences must sink below every non-zeroed term
    base_terms = [r["term"] for r in base]
    filt_terms = [r["term"] for r in filt]
    assert base_terms != filt_terms or all(
        r["score"] > 0 for r in base
    )  # either ranking changed, or there was nothing to filter
    tokens.unpersist()
