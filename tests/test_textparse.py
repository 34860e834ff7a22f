"""Unit + parity tests for the extraction/tokenization core (per-row invariant)."""

import glob
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.refshim import load_reference_functions
from words_in_context_spark.textparse import (
    DocTokens,
    extract_lines,
    extract_plain_lines,
    extract_srt_lines,
    has_alpha,
    is_namecase,
    likely_names,
    looks_like_srt,
    tokenize_lines,
)

SRT_BASIC = """1
00:00:01,000 --> 00:00:03,000
Hello there, friend.

2
00:00:04,000 --> 00:00:06,000
<i>General Kenobi!</i>

3
00:00:07,000 --> 00:00:09,000
[thunder rumbling]
We must go now.
"""


def test_srt_basic_positional():
    lines = extract_srt_lines(SRT_BASIC)
    # front-padded: index == cue number
    assert lines[0] == ""
    assert lines[1] == "Hello there, friend."
    assert lines[2] == "General Kenobi!"
    assert lines[3] == "[thunder rumbling] We must go now."
    assert len(lines) == 4


def test_srt_bom_and_padding():
    text = "﻿5\n00:00:01,000 --> 00:00:02,000\nStart at five.\n\n6\n00:00:03,000 --> 00:00:04,000\nSix here.\n"
    lines = extract_srt_lines(text)
    assert lines[:5] == [""] * 5
    assert lines[5] == "Start at five."
    assert lines[6] == "Six here."


def test_srt_trailing_cue_skips_tag_removal():
    # reference quirk (extract_words.py:158-161): final unterminated cue is
    # flushed WITHOUT the HTML-tag strip
    text = "1\n00:00:01,000 --> 00:00:02,000\n<i>closed cue</i>\n\n2\n00:00:03,000 --> 00:00:04,000\n<i>last cue</i>\n"
    lines = extract_srt_lines(text)
    assert lines[1] == "closed cue"
    assert lines[2] == "<i>last cue</i>"


def test_srt_text_requires_timestamp_and_alpha():
    text = "1\n123 456\nno timestamp yet\n00:00:01,000 --> 00:00:02,000\n789\nreal text\n"
    lines = extract_srt_lines(text)
    assert lines[1] == "real text"


def test_srt_non_successor_number_not_boundary():
    # a numeric line that is not prev+1 does not close the cue (and, being
    # non-alphabetic, contributes no text)
    text = "1\n00:00:01,000 --> 00:00:02,000\nfirst part\n7\nsecond part\n\n2\n00:00:03,000 --> 00:00:04,000\ndone.\n"
    lines = extract_srt_lines(text)
    assert lines[1] == "first part second part"
    assert lines[2] == "done."


def test_plain_lines_and_sniff():
    assert looks_like_srt(SRT_BASIC)
    assert not looks_like_srt("just some\nplain text\n")
    assert extract_plain_lines("a<i>b</i>\n\n  c  \n") == ["ab", "c"]
    assert extract_lines("plain doc here") == ["plain doc here"]


def test_predicates():
    assert has_alpha("ab1")
    assert not has_alpha("123 --:")
    assert has_alpha("ü")  # Unicode-aware, not [a-zA-Z]
    assert is_namecase("George")
    assert is_namecase("Hello,")  # punctuation is caseless → still namecase
    assert not is_namecase("GEORGE")
    assert not is_namecase("george")
    assert not is_namecase("")


def test_tokenize_sound_desc_state_machine():
    doc = tokenize_lines(["[thunder rumbling] we go", "-[flüstert] leise jetzt"])
    flags = {(t.term, t.in_sound_desc) for t in doc.tokens}
    assert ("thunder", True) in flags
    # ']' is checked before emit, so 'rumbling]' flips the flag off, then emits
    # with in_sound_desc=False per reference ordering (extract_words.py:248-251)
    assert ("rumbling", False) in flags
    assert ("we", False) in flags


def test_tokenize_bracket_ordering_matches_reference():
    # reference checks '[' then ']' BEFORE emitting the token; a token
    # containing ']' therefore emits with the flag already off
    doc = tokenize_lines(["[music] hello"])
    by_term = {t.term: t.in_sound_desc for t in doc.tokens}
    assert by_term["music"] is False  # '[music]' has both brackets → off
    assert by_term["hello"] is False
    doc2 = tokenize_lines(["[big music] hello"])
    by_term2 = {t.term: t.in_sound_desc for t in doc2.tokens}
    assert by_term2["big"] is True
    assert by_term2["music"] is False
    doc3 = tokenize_lines(["-[flüstert] kommt er"])
    assert [(t.term, t.in_sound_desc) for t in doc3.tokens][0] == ("flüstert", False)


def test_tokenize_glued_open_bracket_stays_on():
    doc = tokenize_lines(["-[flüstert weiter", "immer noch"])
    by_term = {t.term: t.in_sound_desc for t in doc.tokens}
    assert by_term["flüstert"] is True
    assert by_term["weiter"] is True
    assert by_term["immer"] is True  # persists across lines until ']'


def test_tokenize_german_apostrophe():
    doc = tokenize_lines(["des Heft'gen Sturms"], lang="de")
    terms = [t.term for t in doc.tokens]
    assert "heft'gen" in terms  # kept raw-lowered (extract_words.py:266-276)
    doc_en = tokenize_lines(["des Heft'gen Sturms"], lang="en")
    terms_en = [t.term for t in doc_en.tokens]
    assert "heft" in terms_en and "gen" in terms_en  # en: split on apostrophe


def test_tokenize_hyphen_split():
    doc = tokenize_lines(["a well-lit room"])
    terms = [t.term for t in doc.tokens]
    assert terms == ["a", "well", "lit", "room"]
    # pos advances per emitted sub-token
    assert [t.pos for t in doc.tokens] == [0, 1, 2, 3]
    assert doc.total_words == 4


def test_tokenize_pos_resets():
    doc = tokenize_lines(["one two. three", "- four five"])
    pos = {t.term: t.pos for t in doc.tokens}
    assert pos["one"] == 0 and pos["two"] == 1
    assert pos["three"] == 0  # after sentence end
    assert pos["four"] == 0 and pos["five"] == 1  # '-' resets and is skipped


def test_tokenize_skips_non_alpha():
    doc = tokenize_lines(["123 :: !! abc 4you"])
    terms = [t.term for t in doc.tokens]
    assert terms == ["abc", "you"]


def test_likely_names_rules():
    # Zuzu: ≥2 occurrences, all NameCase, one at pos>0 → name
    # Potter: only 1 occurrence → not a name
    # George: seen lowercase once → not a name
    # Mary: all occurrences at pos 0 → not a name
    doc = tokenize_lines(
        [
            "Zuzu has petals",
            "dear Zuzu again",
            "Potter said no",
            "George went home",
            "george again here",
            "Mary spoke",
            "Mary left",
        ]
    )
    names = likely_names(doc)
    assert names == {"zuzu"}


def test_empty_doc():
    doc = tokenize_lines([])
    assert doc.total_words == 0 and doc.tokens == []
    assert isinstance(doc, DocTokens)


# ---------------------------------------------------------------------------
# Parity vs the actual reference parser (lifted from its AST, test-only)
# ---------------------------------------------------------------------------

REF = load_reference_functions()
REF_DATA = "/root/reference/data"


@pytest.mark.skipif(REF is None, reason="reference source not available")
def test_reference_parser_parity_on_real_corpus(tmp_path):
    """Byte-identical extracted text per document vs the reference
    ``srt_subtitles`` on all 13 shipped subtitle files (the per-row
    invariant from BASELINE.json input_hint)."""
    files = sorted(glob.glob(os.path.join(REF_DATA, "*.srt")))
    assert len(files) >= 10
    for fpath in files:
        expected = REF["srt_subtitles"](fpath)
        with open(fpath, encoding="utf-8", errors="ignore") as f:
            text = f.read()
        got = extract_srt_lines(text)
        assert got == expected, f"mismatch for {os.path.basename(fpath)}"


@pytest.mark.skipif(REF is None, reason="reference source not available")
def test_reference_parser_parity_with_separator(tmp_path):
    files = sorted(glob.glob(os.path.join(REF_DATA, "*.srt")))[:3]
    for fpath in files:
        expected = REF["srt_subtitles"](fpath, separator=" Endlineword")
        with open(fpath, encoding="utf-8", errors="ignore") as f:
            text = f.read()
        assert extract_srt_lines(text, separator=" Endlineword") == expected


_cue_text = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\r\n", categories=("L", "N", "P", "Zs")
    ),
    min_size=0,
    max_size=40,
)


@pytest.mark.skipif(REF is None, reason="reference source not available")
@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.lists(_cue_text, min_size=1, max_size=3), min_size=1, max_size=8),
    st.integers(min_value=1, max_value=5),
)
def test_reference_parser_parity_random_srt(tmp_path_factory, cues, first_num):
    """Property: random SRT-shaped documents parse identically."""
    blocks = []
    num = first_num
    for body_lines in cues:
        body = "\n".join(body_lines)
        blocks.append(f"{num}\n00:00:01,000 --> 00:00:02,000\n{body}\n")
        num += 1
    text = "\n".join(blocks)

    d = tmp_path_factory.mktemp("srt")
    fpath = os.path.join(str(d), "doc.srt")
    with open(fpath, "w", encoding="utf-8") as f:
        f.write(text)

    try:
        expected = REF["srt_subtitles"](fpath)
    except ValueError:
        # the reference crashes on unicode-numeric lines like '²'
        # (isnumeric() true, int() fails); parity is vacuous there
        return
    assert extract_srt_lines(text) == expected


@pytest.mark.skipif(REF is None, reason="reference source not available")
def test_predicate_parity_random_strings():
    import random

    rng = random.Random(7)
    pool = "aA1 üÜ!?.,-[]<>'\"љЉ中ß"
    for _ in range(500):
        s = "".join(rng.choice(pool) for _ in range(rng.randint(1, 12)))
        assert has_alpha(s) == REF["has_alpha"](s)
        if s:
            assert is_namecase(s) == REF["is_namecase"](s)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=30))
def test_has_alpha_fast_path_equals_isalpha_loop(s):
    # the regex fast path must be indistinguishable from the char loop
    assert has_alpha(s) == any(ch.isalpha() for ch in s)
