"""Vectorized batch tokenizer — semantics-identical to textparse.tokenize_lines.

``textparse.tokenize_lines`` is the *semantics reference*: a per-token
sequential loop, trivially auditable against the reference implementation
(/root/reference/extract_words.py:213-304). This module is the *throughput
path* used inside the Arrow UDF: it tokenizes a whole batch of documents at
once with pandas/numpy, and is property-tested equal to the sequential loop
(tests/test_textparse_vec.py).

Design:
  * line → raw-token explosion is pandas C code (str.split + explode);
  * every per-token scalar decision (has_alpha, namecase, bracket flags,
    sentence-end, normalization/splitting, apostrophe rule) is computed by
    THE SAME pure-Python helpers as the sequential path — but only once per
    UNIQUE token string (Zipf: vocabulary ≪ token count), then broadcast
    with take();
  * the order-dependent state machines (bracket flag, sentence-position
    counter) become numpy scans: forward-fill over bracket events, segment
    ids from reset events + cumcount for positions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .textparse import (
    _APOSTROPHE_RE,
    _CJK_LANGS,
    _NON_WORD_RE,
    _SENT_END,
    cjk_parts,
    extract_lines,
    has_alpha,
    is_namecase,
)

TOKEN_COLS = ["doc_idx", "tok_idx", "line_id", "pos", "term",
              "is_namecase", "in_sound_desc"]


class _UniqueTokenInfo:
    """Per-unique-token attributes, computed with the sequential path's own
    predicate functions (parity by construction)."""

    __slots__ = ("open_b", "close_b", "dash", "endsent", "alpha", "namecase",
                 "apos_de", "lower", "parts", "lemma_parts", "n_parts")

    def __init__(self, uniques: np.ndarray, lemmatizer=None, cjk=False):
        n = len(uniques)
        self.open_b = np.empty(n, dtype=bool)
        self.close_b = np.empty(n, dtype=bool)
        self.dash = np.empty(n, dtype=bool)
        self.endsent = np.empty(n, dtype=bool)
        self.alpha = np.empty(n, dtype=bool)
        self.namecase = np.empty(n, dtype=bool)
        self.apos_de = np.empty(n, dtype=bool)
        self.lower = np.empty(n, dtype=object)
        self.parts = np.empty(n, dtype=object)  # normalized alpha parts
        self.n_parts = np.empty(n, dtype=np.int64)  # len(parts), O(1) gather
        # lemmatized twin of parts, computed once per UNIQUE token (T1 seam)
        self.lemma_parts = self.parts if lemmatizer is None else np.empty(
            n, dtype=object
        )
        for i, raw in enumerate(uniques):
            self.open_b[i] = "[" in raw
            self.close_b[i] = "]" in raw
            self.dash[i] = raw == "-"
            self.endsent[i] = raw.endswith(_SENT_END)
            self.alpha[i] = has_alpha(raw)
            self.namecase[i] = is_namecase(raw)
            self.apos_de[i] = bool(_APOSTROPHE_RE.match(raw))
            self.lower[i] = raw.lower()
            parts = (
                cjk_parts(raw.lower())
                if cjk
                else _NON_WORD_RE.sub(" ", raw.lower()).split()
            )
            self.parts[i] = [p for p in parts if has_alpha(p)]
            self.n_parts[i] = len(self.parts[i])
            if lemmatizer is not None:
                self.lemma_parts[i] = [lemmatizer(p) for p in self.parts[i]]


def tokenize_batch(
    urls: list, texts: list, langs: list, lemmatizer=None
) -> pd.DataFrame:
    """Tokenize a batch of documents. Returns a DataFrame with TOKEN_COLS,
    where doc_idx indexes into the input lists (caller maps back to url).

    ``lemmatizer`` (T1 seam, see lemma.py): applied to every normalized part,
    once per unique raw token; apostrophe-rule tokens stay raw. A
    ``lemma.ByLanguage`` router (or dict spec resolved to one) is honored by
    splitting the batch per document language — the per-unique-token lemma
    memoization below is only valid within one language."""
    from .lemma import ByLanguage

    if isinstance(lemmatizer, ByLanguage):
        langs_f = [lg if lg else "en" for lg in langs]
        frames = []
        for lg in sorted(set(langs_f)):
            sel = [i for i, x in enumerate(langs_f) if x == lg]
            sub = tokenize_batch(
                [urls[i] for i in sel],
                [texts[i] for i in sel],
                [langs_f[i] for i in sel],
                lemmatizer=lemmatizer.for_lang(lg),
            )
            if not sub.empty:
                remap = np.asarray(sel, dtype=np.int64)
                sub["doc_idx"] = remap[sub["doc_idx"].to_numpy(dtype=np.int64)]
                frames.append(sub)
        if not frames:
            return pd.DataFrame(columns=TOKEN_COLS)
        return pd.concat(frames, ignore_index=True)

    # ---- script routing: ja/zh/ko/th use cjk_parts ------------------------
    # Unique-token part-splitting is script-routing-dependent, so a mixed
    # batch splits CJK docs from the rest (same remap device as the
    # ByLanguage branch above); a uniform batch just sets the flag.
    cjk_mask = [(lg or "en") in _CJK_LANGS for lg in langs]
    cjk = any(cjk_mask)
    if cjk and not all(cjk_mask):
        frames = []
        for want in (False, True):
            sel = [i for i, c in enumerate(cjk_mask) if c == want]
            if not sel:
                continue
            sub = tokenize_batch(
                [urls[i] for i in sel],
                [texts[i] for i in sel],
                [langs[i] for i in sel],
                lemmatizer=lemmatizer,
            )
            if not sub.empty:
                remap = np.asarray(sel, dtype=np.int64)
                sub["doc_idx"] = remap[sub["doc_idx"].to_numpy(dtype=np.int64)]
                frames.append(sub)
        if not frames:
            return pd.DataFrame(columns=TOKEN_COLS)
        return pd.concat(frames, ignore_index=True)

    # ---- explode docs → lines → raw tokens (C-speed pandas) ---------------
    doc_idx_l, line_id_l, line_l = [], [], []
    for di, text in enumerate(texts):
        if not text:
            continue
        for li, line in enumerate(extract_lines(text)):
            if line:
                doc_idx_l.append(di)
                line_id_l.append(li)
                line_l.append(line)
    if not line_l:
        return pd.DataFrame(columns=TOKEN_COLS)

    lines = pd.DataFrame(
        {
            "doc_idx": np.asarray(doc_idx_l, dtype=np.int32),
            "line_id": np.asarray(line_id_l, dtype=np.int32),
            "toks": pd.Series(line_l).str.split(),
        }
    )
    toks = lines.explode("toks", ignore_index=True).dropna(subset=["toks"])
    if toks.empty:
        return pd.DataFrame(columns=TOKEN_COLS)

    doc_idx = toks["doc_idx"].to_numpy(dtype=np.int64)
    line_id = toks["line_id"].to_numpy(dtype=np.int64)
    codes, uniques = pd.factorize(toks["toks"])
    info = _UniqueTokenInfo(uniques.to_numpy(), lemmatizer=lemmatizer, cjk=cjk)

    n = codes.size
    open_b = info.open_b[codes]
    close_b = info.close_b[codes]
    dash = info.dash[codes]
    endsent = info.endsent[codes]
    alpha = info.alpha[codes]
    namecase = info.namecase[codes]

    # boundaries (first raw token of each line / doc)
    new_line = np.empty(n, dtype=bool)
    new_line[0] = True
    new_line[1:] = (doc_idx[1:] != doc_idx[:-1]) | (line_id[1:] != line_id[:-1])
    new_doc = np.empty(n, dtype=bool)
    new_doc[0] = True
    new_doc[1:] = doc_idx[1:] != doc_idx[:-1]

    # ---- bracket state machine (T3): event scan + forward fill ------------
    # event value per token (state AFTER its own brackets, reference order:
    # '[' then ']'): close → 0; open-only → 1; else inherit
    ev = np.full(n, -1, dtype=np.int8)
    ev[open_b & ~close_b] = 1
    ev[close_b] = 0
    ev[new_doc & (ev == -1)] = 0  # state starts False per document
    # forward fill: index of last non-inherit event
    has_ev = ev != -1
    last_ev_idx = np.maximum.accumulate(
        np.where(has_ev, np.arange(n), -1)
    )
    in_sound = ev[last_ev_idx] == 1

    # ---- sentence-position reset events (T4) ------------------------------
    prev_endsent = np.zeros(n, dtype=bool)
    prev_endsent[1:] = endsent[:-1] & ~new_line[1:]
    prev_dash = np.zeros(n, dtype=bool)
    prev_dash[1:] = dash[:-1] & ~new_line[1:]
    reset_before = new_line | prev_endsent | prev_dash | dash
    seg = np.cumsum(reset_before)

    # ---- emit: drop dashes and non-alpha, split into parts ----------------
    lang_arr = np.asarray(langs, dtype=object)[doc_idx]
    is_de = lang_arr == "de"
    apos = info.apos_de[codes] & is_de & alpha & ~dash

    emit = alpha & ~dash
    idx = np.nonzero(emit)[0]
    if idx.size == 0:
        return pd.DataFrame(columns=TOKEN_COLS)

    # per emitted raw token: list of emitted terms
    codes_e = codes[idx]
    apos_e = apos[idx]
    n_parts = np.where(apos_e, 1, info.n_parts[codes_e])
    keep = n_parts > 0
    idx, codes_e, apos_e, n_parts = idx[keep], codes_e[keep], apos_e[keep], n_parts[keep]
    if idx.size == 0:
        return pd.DataFrame(columns=TOKEN_COLS)

    from itertools import chain

    terms = np.fromiter(
        chain.from_iterable(
            (info.lower[c],) if a else info.lemma_parts[c]
            for c, a in zip(codes_e, apos_e)
        ),
        dtype=object,
        count=int(n_parts.sum()),
    )

    rep = np.repeat(np.arange(idx.size), n_parts)  # part → emitted-token row
    src = idx[rep]  # part → raw-token row

    # ---- per-part position counter: cumcount within (seg) over parts ------
    part_seg = seg[src]
    seg_change = np.empty(part_seg.size, dtype=bool)
    seg_change[0] = True
    seg_change[1:] = part_seg[1:] != part_seg[:-1]
    seg_start = np.maximum.accumulate(
        np.where(seg_change, np.arange(part_seg.size), 0)
    )
    pos = np.arange(part_seg.size) - seg_start

    # ---- per-part doc-local tok_idx ----------------------------------------
    part_doc = doc_idx[src]
    doc_change = np.empty(part_doc.size, dtype=bool)
    doc_change[0] = True
    doc_change[1:] = part_doc[1:] != part_doc[:-1]
    doc_start = np.maximum.accumulate(
        np.where(doc_change, np.arange(part_doc.size), 0)
    )
    tok_idx = np.arange(part_doc.size) - doc_start

    return pd.DataFrame(
        {
            "doc_idx": part_doc,
            "tok_idx": tok_idx,
            "line_id": line_id[src],
            "pos": pos,
            "term": terms,
            "is_namecase": namecase[src],
            "in_sound_desc": in_sound[src],
        }
    )
