"""Results-export sink (S8): content-guid dedup, idempotent re-export,
deck partitioning — the reference's Anki-export invariants
(export.py:117-188) at the sink layer."""

from words_in_context_spark.sinks import export_results, with_guid


def _cards(spark, rows):
    return spark.createDataFrame(rows, "front string, back string, deck string")


def test_guid_is_content_derived_and_stable(spark):
    df = _cards(spark, [("storm", "a storm", "en"), ("storm", "a storm", "en")])
    g = with_guid(df, ["front", "back"]).select("guid").distinct().collect()
    assert len(g) == 1 and len(g[0]["guid"]) == 32
    # different content → different guid
    g2 = with_guid(
        _cards(spark, [("storm", "other back", "en")]), ["front", "back"]
    ).first()["guid"]
    assert g2 != g[0]["guid"]


def test_export_exactly_once(spark, tmp_path):
    path = str(tmp_path / "export")
    first = _cards(
        spark,
        [("storm", "a storm", "en"), ("lantern", "a lantern", "en"),
         ("sturm", "ein Sturm", "de")],
    )
    assert export_results(first, path, ["front", "back"], deck_col="deck") == 3

    # re-export of the same batch is a no-op (crash-rerun / double-click)
    assert export_results(first, path, ["front", "back"], deck_col="deck") == 0

    # overlapping batch: only the genuinely-new card lands
    second = _cards(
        spark, [("storm", "a storm", "en"), ("window", "a window", "en")]
    )
    assert export_results(second, path, ["front", "back"], deck_col="deck") == 1

    out = spark.read.parquet(path)
    assert out.count() == 4
    assert out.select("guid").distinct().count() == 4
    # deck partitioning: stable directory per deck name
    decks = {r["deck"] for r in out.select("deck").distinct().collect()}
    assert decks == {"en", "de"}


def test_export_ranked_words_end_to_end(spark, tmp_path):
    """The product query (ranked words + examples) flows into the sink."""
    from pyspark.sql import functions as F

    from words_in_context_spark.operators.extract import tokenize
    from words_in_context_spark.plans.tfidf import doc_word_scores

    docs = spark.createDataFrame(
        [("u1", "Storm and lantern. The lantern held. Storm rose.", "en"),
         ("u2", "The window stayed. A window and a door.", "en")],
        "url string, text string, lang string",
    )
    top = doc_word_scores(tokenize(docs)).where(F.col("rank") <= 3)
    path = str(tmp_path / "export2")
    n = export_results(
        top.select("url", "term", "score"), path, ["url", "term"]
    )
    assert n == 6
    assert export_results(
        top.select("url", "term", "score"), path, ["url", "term"]
    ) == 0
