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
