"""Freeze the rank fixtures over the real reference corpus.

Generates tests/fixtures/reference_corpus_top10.json (identity-lemmatizer
mode) and reference_corpus_top10_lemma.json (built-in English lemmatizer,
lemma.py) from the pure-Python CorpusOracle. Run ONLY when tokenizer or
scorer semantics deliberately change:

    python tools/freeze_fixtures.py [--check]

--check regenerates in memory and diffs against the committed files instead
of overwriting (exit 1 on drift).
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DATA = "/root/reference/data"
FIX_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)


def build(lemmatizer=None) -> dict:
    from words_in_context_spark.pyoracle import CorpusOracle

    orc = CorpusOracle(lemmatizer=lemmatizer)
    names = []
    for f in sorted(glob.glob(os.path.join(REF_DATA, "*.srt"))):
        name = os.path.basename(f)
        with open(f, encoding="utf-8", errors="ignore") as fh:
            orc.add(name, fh.read(), lang="de" if "faust" in name else "en")
        names.append(name)

    out = {}
    for name in names:
        for variant in ("plain", "name_filtering", "deprioritize_sound_desc",
                        "bm25"):
            if variant == "bm25":
                rows = orc.bm25_doc_word_stats(name)[:10]
            else:
                flags = {} if variant == "plain" else {variant: True}
                rows = orc.doc_word_stats(name, **flags)[:10]
            out[f"{name}|{variant}"] = [
                [r.term, r.count, r.df, round(r.score, 9)] for r in rows
            ]
    return out


def main() -> int:
    from words_in_context_spark.lemma import english_lemma

    check = "--check" in sys.argv
    rc = 0
    for fname, lem in [
        ("reference_corpus_top10.json", None),
        ("reference_corpus_top10_lemma.json", english_lemma),
    ]:
        path = os.path.join(FIX_DIR, fname)
        data = build(lem)
        if check and os.path.exists(path):
            with open(path) as f:
                old = json.load(f)
            if old != data:
                drift = [k for k in data if data[k] != old.get(k)]
                print(f"DRIFT {fname}: {len(drift)} keys, e.g. {drift[:3]}")
                rc = 1
            else:
                print(f"OK    {fname}")
        else:
            with open(path, "w") as f:
                json.dump(data, f, indent=1, sort_keys=True)
            print(f"WROTE {fname} ({len(data)} keys)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
