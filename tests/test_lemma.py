"""Built-in English lemmatizer (the T1 seam, lemma.py): inflection rules,
irregulars, and the protection list. The reference lemmatizes with spaCy
(extract_words.py:207-211) — unavailable here; these pin the deterministic
substitute's behavior."""

import pytest

from words_in_context_spark.lemma import english_lemma, get_lemmatizer

CASES = {
    # irregular verbs
    "went": "go", "gone": "go", "goes": "go", "was": "be", "were": "be",
    "is": "be", "been": "be", "being": "be", "had": "have", "did": "do",
    "said": "say", "made": "make", "taken": "take", "thought": "think",
    "wrote": "write", "caught": "catch", "dying": "die", "lying": "lie",
    # irregular nouns
    "men": "man", "children": "child", "feet": "foot", "wives": "wife",
    "lives": "life", "movies": "movie", "shoes": "shoe",
    # regular plurals / 3rd person
    "dogs": "dog", "makes": "make", "houses": "house", "classes": "class",
    "watches": "watch", "boxes": "box", "studies": "study", "heroes": "hero",
    # -ed with doubling / e-restoration
    "stopped": "stop", "hoped": "hope", "wanted": "want", "called": "call",
    "agreed": "agree", "studied": "study", "played": "play", "loved": "love",
    "seemed": "seem", "watched": "watch",
    # -ing
    "running": "run", "making": "make", "going": "go", "seeing": "see",
    "doing": "do", "talking": "talk", "hoping": "hope",
    # protected / uninflected words stay put
    "thing": "thing", "king": "king", "during": "during", "morning": "morning",
    "nothing": "nothing", "this": "this", "his": "his", "was_": None,
    "class": "class", "bus": "bus", "news": "news", "series": "series",
    "red": "red", "need": "need", "always": "always", "spring": "spring",
}


@pytest.mark.parametrize("word,lemma", [(w, l) for w, l in CASES.items() if l])
def test_english_lemma(word, lemma):
    assert english_lemma(word) == lemma


def test_lemma_idempotent_on_outputs():
    """lemma(lemma(w)) == lemma(w) for every case output — lemmas are fixed
    points (no rule chain re-fires on a produced lemma)."""
    for w, l in CASES.items():
        if l:
            assert english_lemma(l) == l, (w, l)


def test_registry():
    assert get_lemmatizer(None) is None
    assert get_lemmatizer("identity") is None
    assert get_lemmatizer("english") is english_lemma
    assert get_lemmatizer(english_lemma) is english_lemma  # callables pass
    with pytest.raises(ValueError):
        get_lemmatizer("spacy")


def test_tokenize_lines_lemma_mode():
    from words_in_context_spark.textparse import tokenize_lines

    doc = tokenize_lines(
        ["The children went running.", "Mary's dogs stopped."],
        lemmatizer=english_lemma,
    )
    terms = [t.term for t in doc.tokens]
    assert terms == [
        "the", "child", "go", "run", "mary", "s", "dog", "stop"
    ]
    # identity mode unchanged
    doc0 = tokenize_lines(["The children went running."])
    assert [t.term for t in doc0.tokens] == ["the", "children", "went", "running"]


GERMAN_CASES = {
    # sein / haben / werden / modals
    "ist": "sein", "war": "sein", "gewesen": "sein", "wäre": "sein",
    "hat": "haben", "hatte": "haben", "gehabt": "haben",
    "wird": "werden", "wurde": "werden", "worden": "werden",
    "kann": "können", "konnte": "können", "möchte": "mögen",
    "muss": "müssen", "wollte": "wollen",
    # strong verbs
    "ging": "gehen", "gegangen": "gehen", "kam": "kommen",
    "sah": "sehen", "gesehen": "sehen", "wusste": "wissen",
    "sprach": "sprechen", "ließ": "lassen", "schrieb": "schreiben",
    "gesagt": "sagen", "gemacht": "machen",
    # safe derivational plurals
    "zeitungen": "zeitung", "möglichkeiten": "möglichkeit",
    "schönheiten": "schönheit", "freundschaften": "freundschaft",
    "lehrerinnen": "lehrerin",
    # conservative: ambiguous forms stay put (no aggressive stemming)
    "häuser": "häuser", "kinder": "kinder", "tage": "tage",
    "flüstert": "flüstert", "sturm": "sturm",
}


@pytest.mark.parametrize("word,lemma", sorted(GERMAN_CASES.items()))
def test_german_lemma(word, lemma):
    from words_in_context_spark.lemma import german_lemma

    assert german_lemma(word) == lemma


def test_german_lemma_idempotent_and_registered():
    from words_in_context_spark.lemma import IRREGULAR_DE, german_lemma

    for w, expected in IRREGULAR_DE.items():
        assert german_lemma(w) == expected
        assert german_lemma(expected) == expected, expected  # idempotent
    assert get_lemmatizer("german") is german_lemma


def test_by_language_seam_through_spark_tokenize():
    """The dict → ByLanguage spec flows through the Arrow UDTF seam
    (operators/extract.tokenize): one mixed-language DataFrame, each doc
    lemmatized by its own language's lemmatizer ('war' stays in the English
    doc, becomes 'sein' in the German one), unlisted languages identity."""
    import sys

    sys.path.insert(0, "/root/repo")
    from words_in_context_spark.operators.extract import tokenize
    from words_in_context_spark.session import get_spark

    spark = get_spark(cores=2, app_name="wics-tests-bylang",
                      shuffle_partitions=2)
    docs = spark.createDataFrame(
        [
            ("u-en", "1\n00:00:00,000 --> 00:00:01,000\nwar went children\n",
             "en"),
            ("u-de", "1\n00:00:00,000 --> 00:00:01,000\nwar ging zeitungen\n",
             "de"),
            ("u-fr", "1\n00:00:00,000 --> 00:00:01,000\nwar went allées\n",
             "fr"),
        ],
        "url string, text string, lang string",
    )
    rows = tokenize(
        docs, lemmatizer={"en": "english", "de": "german"}
    ).collect()
    terms = {}
    for r in rows:
        terms.setdefault(r["url"], []).append((r["tok_idx"], r["term"]))
    got = {u: [t for _, t in sorted(v)] for u, v in terms.items()}
    assert got["u-en"] == ["war", "go", "child"]
    assert got["u-de"] == ["sein", "gehen", "zeitung"]
    assert got["u-fr"] == ["war", "went", "allées"]


@pytest.mark.parametrize(
    "word,lemma",
    [
        ("es", "ser"), ("fueron", "ser"), ("estaban", "estar"),
        ("van", "ir"), ("hay", "haber"), ("tienen", "tener"),
        ("hicieron", "hacer"), ("dijo", "decir"), ("pudieron", "poder"),
        ("canciones", "canción"), ("decisiones", "decisión"),
        ("ciudades", "ciudad"), ("posibilidades", "posibilidad"),
        ("actitudes", "actitud"),
        ("casa", "casa"), ("perro", "perro"),  # untouched regulars
    ],
)
def test_spanish_lemma(word, lemma):
    from words_in_context_spark.lemma import spanish_lemma

    assert spanish_lemma(word) == lemma


def test_spanish_lemma_idempotent_and_registered():
    from words_in_context_spark.lemma import (
        IRREGULAR_ES,
        get_lemmatizer,
        spanish_lemma,
    )

    assert get_lemmatizer("spanish") is spanish_lemma
    for w in list(IRREGULAR_ES) + ["canciones", "ciudades", "actitudes"]:
        out = spanish_lemma(w)
        assert spanish_lemma(out) == out  # lemmas are fixpoints


def test_three_language_routing_through_spark_tokenize(spark):
    """ByLanguage with en+de+es: each document routes to its own
    lemmatizer; the unmapped language falls through to identity."""
    from words_in_context_spark.operators.extract import tokenize

    docs = spark.createDataFrame(
        [
            ("u-en", "1\n00:00:00,000 --> 00:00:01,000\nwent children\n",
             "en"),
            ("u-de", "1\n00:00:00,000 --> 00:00:01,000\nging zeitungen\n",
             "de"),
            ("u-es", "1\n00:00:00,000 --> 00:00:01,000\nfueron canciones\n",
             "es"),
            ("u-fr", "1\n00:00:00,000 --> 00:00:01,000\nfueron allées\n",
             "fr"),
        ],
        "url string, text string, lang string",
    )
    rows = tokenize(
        docs, lemmatizer={"en": "english", "de": "german", "es": "spanish"}
    ).collect()
    terms = {}
    for r in rows:
        terms.setdefault(r["url"], []).append((r["tok_idx"], r["term"]))
    got = {u: [t for _, t in sorted(v)] for u, v in terms.items()}
    assert got["u-en"] == ["go", "child"]
    assert got["u-de"] == ["gehen", "zeitung"]
    assert got["u-es"] == ["ser", "canción"]
    assert got["u-fr"] == ["fueron", "allées"]


@pytest.mark.parametrize(
    "word,lemma",
    [
        ("est", "être"), ("furent", "être"), ("été", "être"),
        ("ont", "avoir"), ("eu", "avoir"),
        ("vont", "aller"), ("allées", "aller"),
        ("fit", "faire"), ("peuvent", "pouvoir"), ("voulu", "vouloir"),
        ("vinrent", "venir"), ("prit", "prendre"), ("mis", "mettre"),
        ("faut", "falloir"),
        ("nations", "nation"), ("décisions", "décision"),
        ("activités", "activité"), ("gouvernements", "gouvernement"),
        ("châteaux", "château"), ("journaux", "journal"),
        ("animaux", "animal"), ("travaux", "travail"),
        ("yeux", "œil"),
        ("taux", "taux"), ("faux", "faux"),   # short -aux guard
        ("maison", "maison"), ("chien", "chien"),  # untouched regulars
        ("vit", "vit"),  # ambiguous voir/vivre → deliberately untouched
    ],
)
def test_french_lemma(word, lemma):
    from words_in_context_spark.lemma import french_lemma

    assert french_lemma(word) == lemma


def test_french_lemma_idempotent_and_registered():
    from words_in_context_spark.lemma import (
        IRREGULAR_FR,
        french_lemma,
        get_lemmatizer,
    )

    assert get_lemmatizer("french") is french_lemma
    for w in list(IRREGULAR_FR) + [
        "nations", "journaux", "châteaux", "gouvernements", "activités"
    ]:
        out = french_lemma(w)
        assert french_lemma(out) == out  # lemmas are fixpoints


def test_four_language_routing_through_spark_tokenize(spark):
    """ByLanguage with en+de+es+fr: the reference picks a spaCy model per
    document language (extract_words.py:60,348,370); all four pure-Python
    lemmatizers route per doc, unmapped languages fall through."""
    from words_in_context_spark.operators.extract import tokenize

    docs = spark.createDataFrame(
        [
            ("u-fr", "1\n00:00:00,000 --> 00:00:01,000\nfurent journaux\n",
             "fr"),
            ("u-es", "1\n00:00:00,000 --> 00:00:01,000\nfueron canciones\n",
             "es"),
            ("u-pt", "1\n00:00:00,000 --> 00:00:01,000\nfurent journaux\n",
             "pt"),
        ],
        "url string, text string, lang string",
    )
    rows = tokenize(
        docs,
        lemmatizer={"en": "english", "de": "german", "es": "spanish",
                    "fr": "french"},
    ).collect()
    terms = {}
    for r in rows:
        terms.setdefault(r["url"], []).append((r["tok_idx"], r["term"]))
    got = {u: [t for _, t in sorted(v)] for u, v in terms.items()}
    assert got["u-fr"] == ["être", "journal"]
    assert got["u-es"] == ["ser", "canción"]
    assert got["u-pt"] == ["furent", "journaux"]  # unmapped → identity
