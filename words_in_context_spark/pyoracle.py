"""Pure-Python scoring oracle — reference ``get_doc_word_stats`` semantics.

Reimplements (NOT copies) the reference's per-document TF-IDF keyword ranking
(/root/reference/extract_words.py:389-445) on top of this engine's tokenizer
(``textparse``). Used by tests to certify that the distributed Spark pipeline
is rank-identical to a sequential, trivially-auditable implementation:

  score(word, doc) = tf/doc_len * ln(N / df)                 (Q1, :418-428)
  if name_filtering and word is a likely name: score = 0     (Q2, :430-433)
  if deprioritize_sound_desc and any occurrence outside
     [...] brackets: score *= 10000                          (Q3, :435-437)
  sort descending by score; ties keep first-seen order
  (Python stable sort — the engine pins the same tie-break
  explicitly: first line_id, then term)                      (Q4, :443-444)
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from .textparse import DocTokens, extract_and_tokenize, likely_names


@dataclass
class WordStats:
    term: str
    count: int
    doc_len: int
    frequency: float
    df: int
    score: float
    occ_line_ids: list[int]


class CorpusOracle:
    """In-memory corpus: doc_id → DocTokens, with reference scoring."""

    def __init__(self, lemmatizer=None) -> None:
        self.docs: dict[str, DocTokens] = {}
        self.lemmatizer = lemmatizer  # T1 seam, see lemma.py

    def add(self, doc_id: str, text: str, lang: str = "en") -> None:
        self.docs[doc_id] = extract_and_tokenize(
            text, lang=lang, lemmatizer=self.lemmatizer
        )

    def add_tokens(self, doc_id: str, doc: DocTokens) -> None:
        self.docs[doc_id] = doc

    def doc_word_stats(
        self,
        doc_id: str,
        name_filtering: bool = False,
        deprioritize_sound_desc: bool = False,
    ) -> list[WordStats]:
        """Ranked word list for one document, reference semantics."""
        doc = self.docs[doc_id]
        n_docs = len(self.docs)

        term_lines: dict[str, list[int]] = {}
        term_sound: dict[str, list[bool]] = {}
        first_seen: dict[str, int] = {}
        for i, t in enumerate(doc.tokens):
            term_lines.setdefault(t.term, []).append(t.line_id)
            term_sound.setdefault(t.term, []).append(t.in_sound_desc)
            first_seen.setdefault(t.term, i)

        vocab_by_doc = {
            did: {t.term for t in d.tokens} for did, d in self.docs.items()
        }
        names = likely_names(doc) if name_filtering else set()

        rows: list[WordStats] = []
        for term, line_ids in term_lines.items():
            tf = len(line_ids)
            freq = tf / doc.total_words
            df = sum(1 for vocab in vocab_by_doc.values() if term in vocab)
            score = freq * math.log(n_docs / df)
            if name_filtering and term in names:
                score = 0.0
            if deprioritize_sound_desc and not all(term_sound[term]):
                score *= 10000
            rows.append(
                WordStats(term, tf, doc.total_words, freq, df, score, line_ids)
            )

        # Python's sort is stable: equal scores keep insertion (first-seen)
        # order, matching the reference exactly.
        rows.sort(key=lambda r: r.score, reverse=True)
        return rows

    def bm25_doc_word_stats(
        self, doc_id: str, k1: float = 1.2, b: float = 0.75
    ) -> list[WordStats]:
        """BM25 variant of the per-document term ranking (the generalized
        scorer the north rule asks for; tf normalized by doc length against
        the corpus average, idf with the standard +0.5 smoothing)."""
        doc = self.docs[doc_id]
        n_docs = len(self.docs)
        avgdl = sum(d.total_words for d in self.docs.values()) / n_docs

        term_lines: dict[str, list[int]] = {}
        for t in doc.tokens:
            term_lines.setdefault(t.term, []).append(t.line_id)
        vocab_by_doc = {
            did: {t.term for t in d.tokens} for did, d in self.docs.items()
        }

        rows = []
        for term, line_ids in term_lines.items():
            tf = len(line_ids)
            df = sum(1 for vocab in vocab_by_doc.values() if term in vocab)
            idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            dl = doc.total_words
            score = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            rows.append(
                WordStats(term, tf, dl, tf / dl, df, score, line_ids)
            )
        rows.sort(key=lambda r: r.score, reverse=True)
        return rows

    def bm25_query(
        self, query_terms: list[str], k1: float = 1.2, b: float = 0.75
    ) -> list[tuple[str, float]]:
        """Classic BM25 document retrieval: score every doc against the query,
        return (doc_id, score) sorted descending (tie-break: doc_id asc)."""
        n_docs = len(self.docs)
        avgdl = sum(d.total_words for d in self.docs.values()) / n_docs
        tf_by_doc: dict[str, dict[str, int]] = {}
        for did, d in self.docs.items():
            tfs: dict[str, int] = {}
            for t in d.tokens:
                tfs[t.term] = tfs.get(t.term, 0) + 1
            tf_by_doc[did] = tfs

        scores: dict[str, float] = {}
        for term in query_terms:
            df = sum(1 for tfs in tf_by_doc.values() if term in tfs)
            if df == 0:
                continue
            idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            for did, tfs in tf_by_doc.items():
                tf = tfs.get(term, 0)
                if tf == 0:
                    continue
                dl = self.docs[did].total_words
                s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
                scores[did] = scores.get(did, 0.0) + s

        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
