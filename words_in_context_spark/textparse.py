"""Pure-Python text extraction + tokenization — the per-row invariant.

This module defines the *exact* document→lines→tokens semantics of the engine.
The same functions run (a) standalone in unit tests, (b) inside the Arrow
``mapInPandas`` extract UDTF (``operators/extract.py``), and (c) in the
pure-Python scoring oracle used by rank-identity tests — so parity between the
Spark job and the reference semantics holds by construction.

Reference semantics being reproduced (cites into /root/reference):
  - SRT cue extraction: ``srt_subtitles`` extract_words.py:104-163 — BOM strip,
    numeric-cue detection with front padding (list index == cue number),
    timestamp-gated text lines, HTML-tag removal on cue flush, the quirk that
    the trailing unterminated cue is flushed WITHOUT tag removal
    (extract_words.py:158-161), intra-cue join with single spaces.
  - Token emission state machines: ``analyze_file`` extract_words.py:191-304 —
    square-bracket sound-description flag via substring check (handles glued
    ``-[flüstert``), in-sentence position counter with reset on line start /
    sentence-ending punctuation / bare ``-`` token, punctuation/non-alpha skip,
    German apostrophe contraction kept raw (extract_words.py:266-276),
    hyphen/compound split via alphabet normalization (extract_words.py:280-303).
  - Likely-name detection: extract_words.py:306-327 — name iff never seen
    non-namecased AND ≥2 occurrences AND ≥1 occurrence at sentence position >0.

The engine's lemmatizer is deliberately the identity function (deterministic,
dependency-free); the reference's spaCy lemmatization is model-version-
dependent and not reproducible in this environment, so lemma-dependent golden
fixtures are re-frozen against THIS tokenizer (see tests/).
"""

from __future__ import annotations

import re as _stdre
from dataclasses import dataclass, field

try:  # `regex` supports \p{Latin}/\p{Cyrillic}; fall back to std-re ranges
    import regex as _re

    _APOSTROPHE_RE = _re.compile(r"[\p{Latin}]{1,50}'[\p{Latin}]{2,50}")
    _NON_WORD_RE = _re.compile(r"[^\p{Latin}\p{Cyrillic}]")
except ImportError:  # pragma: no cover - regex is present in the test image
    _LATIN = "A-Za-zÀ-ɏḀ-ỿ"
    _CYRILLIC = "Ѐ-ӿԀ-ԯ"
    _APOSTROPHE_RE = _stdre.compile(rf"[{_LATIN}]{{1,50}}'[{_LATIN}]{{2,50}}")
    _NON_WORD_RE = _stdre.compile(rf"[^{_LATIN}{_CYRILLIC}]")

# ---- no-whitespace-script tokenization (ja/zh/ko/th) -----------------------
# The reference corpus pipeline language-detects these scripts
# (extract_words.py:165-181 routes every langdetect language); the alphabet
# normalization above (P8) would strip their characters entirely (they are
# neither Latin nor Cyrillic), so documents routed here by lang / lang_id are
# tokenized as overlapping CHARACTER BIGRAMS per script run — the standard
# IR segmentation for unsegmented scripts (CJK bigram indexing). Ranges match
# operators/textquality.py's lang_id script-vote classes exactly, so a doc
# detected as ja/zh/ko/th tokenizes with the same character inventory that
# routed it.
_CJK_LANGS = frozenset({"ja", "zh", "ko", "th"})
_CJK_RUN_RE = _stdre.compile(
    "["
    "\u3040-\u30FF"  # hiragana + katakana (lang_id _KANA)
    "\u4E00-\u9FFF"  # CJK unified ideographs (lang_id _HAN)
    "\uAC00-\uD7AF\u1100-\u11FF"  # hangul syllables + jamo (lang_id _HANGUL)
    "\u0E00-\u0E7F"  # thai (lang_id _THAI)
    "]+"
)


def cjk_parts(raw_lower: str) -> list[str]:
    """Script-aware part split for ja/zh/ko/th documents: each run of
    kana/han/hangul/thai characters emits its overlapping character bigrams
    (the character itself for a length-1 run); interleaved Latin/Cyrillic
    substrings fall through to the standard alphabet normalization (P8), so
    a CJK document's embedded ASCII words index normally."""
    parts: list[str] = []
    pos = 0

    def _latin_seg(seg: str) -> None:
        if seg:
            parts.extend(
                p for p in _NON_WORD_RE.sub(" ", seg).split() if has_alpha(p)
            )

    for m in _CJK_RUN_RE.finditer(raw_lower):
        _latin_seg(raw_lower[pos:m.start()])
        run = m.group()
        if len(run) == 1:
            parts.append(run)
        else:
            parts.extend(run[i:i + 2] for i in range(len(run) - 1))
        pos = m.end()
    _latin_seg(raw_lower[pos:])
    return parts


# HTML/formatting tag pattern — same effective pattern as the reference's
# TAG_REGEX (extract_words.py:26); matches e.g. "<i>", "</i>", "{y:i}>"-ish
# runs: any run of '<', '|', '/' chars, one more char, then '>'.
_TAG_RE = _stdre.compile(r"[<|\/<]*.>")

# SRT timestamp line, searched anywhere in the line (extract_words.py:24,150).
_TIMESTAMP_RE = _stdre.compile(
    r"\d{2}:\d{2}:\d{2},\d{3} --> \d{2}:\d{2}:\d{2},\d{3}"
)

_BOM = chr(65279)

_SENT_END = (".", "!", "?", "…")


_ASCII_ALPHA_SEARCH = _stdre.compile(r"[A-Za-z]").search


def has_alpha(s: str) -> bool:
    """True if any character is Unicode-alphabetic (extract_words.py:83-87).

    Hot path (called per line and per token). ASCII strings — the common
    case — take a C-speed regex search that is exactly ``isalpha`` on ASCII;
    anything else falls back to the per-char loop. (A \\p{L} regex fast path
    is NOT equivalent: the regex module ships newer Unicode tables than
    CPython's ``str.isalpha`` — e.g. U+13441 — found by hypothesis.)"""
    if s.isascii():
        return _ASCII_ALPHA_SEARCH(s) is not None
    return any(ch.isalpha() for ch in s)


def is_namecase(s: str) -> bool:
    """First char upper, remainder lower (extract_words.py:89-93)."""
    if not s:
        return False
    return s[0].isupper() and s[1:].islower()


def _is_cue_number(line: str) -> bool:
    if not line.isnumeric():
        return False
    try:
        int(line)
    except ValueError:
        return False
    return True


def extract_srt_lines(text: str, separator: str = "") -> list[str]:
    """Parse SRT-formatted text into a positional list of cleaned cue strings.

    ``result[i]`` is the text of cue number ``i`` (the list is front-padded
    with ``separator`` entries up to the first cue number, matching the
    reference's index==cue-number invariant, extract_words.py:129-134).

    Behaviour-identical to the reference ``srt_subtitles`` given the same
    decoded text, including:
      * BOM + whitespace stripping while scanning for the first cue number;
      * a numeric line only closes the current cue when it equals prev+1;
      * text lines count only when they contain an alphabetic char AND a
        timestamp line has been seen for the current cue;
      * HTML tags removed when a cue is closed by its successor — but NOT on
        the final unterminated cue flushed at EOF (reference quirk,
        extract_words.py:158-161).
    """
    out: list[str] = []
    started = False
    cue_num = 0
    saw_timestamp = False
    buf_parts: list[str] = []

    def _flush(strip_tags: bool) -> str:
        buf = "".join(buf_parts)
        body = _TAG_RE.sub("", buf).strip() if strip_tags else buf
        return body.strip().replace("\n", " ") + separator

    ts_search = _TIMESTAMP_RE.search  # hot loop: bind lookups once
    for raw in text.splitlines():
        if not started:
            head = raw.replace(_BOM, "").strip()
            if _is_cue_number(head):
                started = True
                cue_num = int(head)
                out.extend([separator] * cue_num)
            continue

        line = raw.strip()
        if _is_cue_number(line) and int(line) == cue_num + 1:
            out.append(_flush(strip_tags=True))
            cue_num += 1
            saw_timestamp = False
            buf_parts.clear()
        # '-->' containment is a C-speed pre-filter: the full timestamp regex
        # only runs on lines that can possibly match (text lines dominate)
        elif "-->" in line and ts_search(line):
            saw_timestamp = True
        elif saw_timestamp and has_alpha(line):
            buf_parts.append(line + " ")

    if saw_timestamp:
        out.append(_flush(strip_tags=False))

    return out


# --------------------------------------------------------------------------
# HTML → text (the generalization of the reference's per-cue TAG_REGEX strip,
# extract_words.py:26,142-143, to whole web pages): drop non-content blocks
# (script/style/comments), break block-level tags into lines, strip remaining
# tags, decode entities. Pure Python for the Arrow UDF path; the JVM twin is
# functions/html.py (same regexp chain as built-in expressions).
# --------------------------------------------------------------------------

_HTML_COMMENT_RE = _stdre.compile(r"<!--.*?-->", _stdre.S)
_HTML_SCRIPT_STYLE_RE = _stdre.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", _stdre.S | _stdre.I
)
_HTML_BLOCK_TAG_RE = _stdre.compile(
    r"<\s*/?\s*(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|section|article|"
    r"header|footer|blockquote|pre|title)\b[^>]*>",
    _stdre.I,
)
_HTML_TAG_RE = _stdre.compile(r"<[^>]*>")
_HTML_DETECT_RE = _stdre.compile(
    r"(?i)<\s*(!doctype|html|head|body|div|p|br|script|style|title|h[1-6])\b"
)


def looks_like_html(text: str) -> bool:
    """Cheap format sniff on the document head: any structural HTML tag."""
    return _HTML_DETECT_RE.search(text[:4096]) is not None


def html_to_text(html: str) -> str:
    """Extract visible text from an HTML page.

    Order matters: comments and script/style bodies are removed FIRST (their
    contents are never visible text), then block-level tags become line
    breaks (so extract_lines gets one entry per block — headings, paragraphs,
    list items), then all remaining tags become spaces, then character
    entities are decoded. Whitespace inside a line is collapsed; empty lines
    are dropped by extract_plain_lines downstream."""
    import html as _htmlmod

    s = _HTML_COMMENT_RE.sub(" ", html)
    s = _HTML_SCRIPT_STYLE_RE.sub(" ", s)
    s = _HTML_BLOCK_TAG_RE.sub("\n", s)
    s = _HTML_TAG_RE.sub(" ", s)
    s = _htmlmod.unescape(s)
    lines = [" ".join(ln.split()) for ln in s.splitlines()]
    return "\n".join(ln for ln in lines if ln)


def extract_plain_lines(text: str) -> list[str]:
    """Extraction for non-SRT documents: one entry per non-empty line,
    HTML tags removed, whitespace normalized. line_id == line ordinal."""
    out = []
    for raw in text.splitlines():
        line = _TAG_RE.sub("", raw.replace(_BOM, "")).strip()
        if line:
            out.append(line)
    return out


def looks_like_srt(text: str) -> bool:
    """Cheap format sniff: a numeric cue line followed (within a few lines)
    by a timestamp line."""
    lines = text.splitlines()[:12]
    for i, raw in enumerate(lines):
        if _is_cue_number(raw.replace(_BOM, "").strip()):
            for nxt in lines[i + 1 : i + 4]:
                if _TIMESTAMP_RE.search(nxt):
                    return True
    return False


def extract_lines(text: str) -> list[str]:
    """Dispatch: SRT-structured text uses cue extraction (positional list),
    HTML pages are reduced to visible text first (one line per block-level
    element), anything else uses plain line extraction."""
    if looks_like_srt(text):
        return extract_srt_lines(text)
    if looks_like_html(text):
        # html_to_text output is already tag-free and whitespace-normalized;
        # do NOT route it through extract_plain_lines — its per-line TAG_RE
        # strip would mangle decoded entities (e.g. '&lt;tag&gt;' → '<tag>')
        return [ln for ln in html_to_text(text).splitlines() if ln]
    return extract_plain_lines(text)


@dataclass
class Token:
    """One emitted token occurrence."""

    line_id: int  # cue / line index within the document
    pos: int  # in-sentence position counter (reference T4 semantics)
    term: str  # normalized term (lowercased, alphabet-normalized)
    is_namecase: bool  # raw surface token was NameCase
    in_sound_desc: bool  # inside [...] per the bracket state machine


@dataclass
class DocTokens:
    tokens: list[Token] = field(default_factory=list)
    total_words: int = 0


def tokenize_lines(
    lines: list[str], lang: str = "en", lemmatizer=None
) -> DocTokens:
    """Sequential token-emission over a document's lines.

    Mirrors the per-token state machines of the reference ``analyze_file``
    (extract_words.py:213-304) with the engine lemmatizer:

    per line:  pos counter resets at line start (Endlineword analog, T2);
    per raw whitespace token, in order (matching the reference loop order):
      1. '[' / ']' substring check flips the sound-description flag (T3);
      2. pos resets after a sentence-ending token or a bare '-' (T4);
      3. punctuation-only / non-alpha tokens are skipped (P7);
      4. German apostrophe contractions are kept raw-lowered (T5);
      5. otherwise the lowered token is alphabet-normalized and split;
         each alpha-bearing part is emitted (T6), incrementing pos and the
         document word counter per emitted part (T7/T8).

    ``lemmatizer`` may be a ``lemma.ByLanguage`` router — resolved here for
    this document's ``lang``, mirroring the reference's per-language model
    pick (extract_words.py:348,370).
    ``lemmatizer`` is the T1 seam (reference lemmatizes with spaCy,
    extract_words.py:207-211 — unavailable here): a ``str -> str`` callable
    applied to each emitted normalized part (see lemma.py; identity when
    None). Apostrophe-rule tokens stay raw, matching the reference's
    keep-as-is branch (extract_words.py:266-276).
    """
    from .lemma import ByLanguage

    if isinstance(lemmatizer, ByLanguage):
        lemmatizer = lemmatizer.for_lang(lang)

    result = DocTokens()
    in_sound_desc = False

    for line_id, line in enumerate(lines):
        pos = 0
        reset_next = False
        for raw in line.split():
            if "[" in raw:
                in_sound_desc = True
            if "]" in raw:
                in_sound_desc = False

            if reset_next or raw == "-":
                pos = 0
            reset_next = raw.endswith(_SENT_END)
            if raw == "-":
                continue

            if not has_alpha(raw):
                continue

            namecased = is_namecase(raw)

            if lang == "de" and _APOSTROPHE_RE.match(raw):
                result.tokens.append(
                    Token(line_id, pos, raw.lower(), namecased, in_sound_desc)
                )
                pos += 1
                result.total_words += 1
                continue

            parts = (
                cjk_parts(raw.lower())
                if lang in _CJK_LANGS
                else _NON_WORD_RE.sub(" ", raw.lower()).split()
            )
            for part in parts:
                if not has_alpha(part):
                    continue
                if lemmatizer is not None:
                    part = lemmatizer(part)
                result.tokens.append(
                    Token(line_id, pos, part, namecased, in_sound_desc)
                )
                pos += 1
                result.total_words += 1

    return result


def likely_names(doc: DocTokens) -> set[str]:
    """Terms that are likely proper names (extract_words.py:306-327):
    every occurrence is NameCase, ≥2 occurrences, and at least one occurrence
    at in-sentence position > 0."""
    occs: dict[str, int] = {}
    name_positions: dict[str, list[int]] = {}
    for t in doc.tokens:
        occs[t.term] = occs.get(t.term, 0) + 1
        if t.is_namecase:
            name_positions.setdefault(t.term, []).append(t.pos)

    names = set()
    for term, positions in name_positions.items():
        if occs[term] == len(positions) and len(positions) >= 2 and any(positions):
            names.add(term)
    return names


def extract_and_tokenize(
    text: str, lang: str = "en", lemmatizer=None
) -> DocTokens:
    """Full document pipeline: extract lines then tokenize."""
    return tokenize_lines(extract_lines(text), lang=lang, lemmatizer=lemmatizer)
