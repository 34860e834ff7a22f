"""Test-only shim: load selected pure functions from the reference source.

The reference module (/root/reference/extract_words.py) imports spacy /
langdetect / googletrans at import time — none of which exist in this image —
so we lift ONLY the dependency-free definitions we need for behavioral parity
testing (``srt_subtitles``, ``has_alpha``, ``is_namecase``, ``separate_fpath``
and the regex constants) out of its AST and exec them in a clean namespace.

This is used exclusively to *verify* that our from-scratch implementation is
behavior-identical; no reference code ships in the engine.
"""

from __future__ import annotations

import ast
import os

REF_PATH = "/root/reference/extract_words.py"

_WANTED = {
    "TIMESTAMP_REGEX",
    "NON_ALPHABET_REGEX",
    "TAG_REGEX",
    "has_alpha",
    "is_namecase",
    "separate_fpath",
    "srt_subtitles",
}


def load_reference_functions() -> dict | None:
    if not os.path.isfile(REF_PATH):
        return None
    try:
        import regex
    except ImportError:
        return None

    with open(REF_PATH, encoding="utf-8") as f:
        tree = ast.parse(f.read())

    selected = []
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in _WANTED:
            selected.append(node)
        elif isinstance(node, ast.Assign):
            names = {t.id for t in node.targets if isinstance(t, ast.Name)}
            if names & _WANTED:
                selected.append(node)

    ns: dict = {"re": regex, "os": os}
    exec(  # noqa: S102 - trusted local file, test-only
        compile(ast.Module(body=selected, type_ignores=[]), REF_PATH, "exec"), ns
    )
    return ns
