"""Custom stateful streaming operator: first-seen content dedup.

A web-scale ingest pipeline dedups documents BEFORE indexing them; done in
the stream, every content digest must be remembered across micro-batches.
Structured Streaming's dropDuplicates can do key-equality, but the pipeline
wants per-key statistics (how many duplicates were suppressed) and bounded
state — so this is the engine's ``applyInPandasWithState`` surface: explicit
keyed state (seen-count + first-seen timestamp), append-mode emission of
ONLY each digest's first document, optional processing-time TTL so state
doesn't grow unboundedly at 10^12 docs (a digest not re-seen within the TTL
is forgotten — the standard bounded-memory trade: a duplicate arriving after
the TTL re-emits).

The state survives checkpoint restarts (tested: stop the query, add files,
restart on the same checkpoint — duplicates of batch-1 docs stay
suppressed).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import normalized_text

OUTPUT_SCHEMA = (
    "digest string, url string, text string, first_seen_batch_rows int"
)
STATE_SCHEMA = "n_seen long"


def _dedup_fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any):
    """Per-digest state machine: first micro-batch group emits the first
    row; every later arrival only bumps the suppressed-duplicate counter."""
    digest = key[0]
    first: pd.DataFrame | None = None
    n = 0
    for pdf in pdfs:
        n += len(pdf)
        if first is None and len(pdf):
            first = pdf.iloc[:1]
    if state.hasTimedOut:
        state.remove()
        return
    already = state.exists
    n_seen = state.get[0] if already else 0
    state.update((n_seen + n,))
    if not already and first is not None:
        yield pd.DataFrame(
            {
                "digest": [digest],
                "url": first["url"].values,
                "text": first["text"].values,
                "first_seen_batch_rows": [n],
            }
        )


def streaming_dedup_first(
    docs_stream: DataFrame,
    text_col: str = "text",
    ttl_ms: int | None = None,
) -> DataFrame:
    """(digest, url, text, first_seen_batch_rows): the first document seen
    per normalized-content digest, exactly once across all micro-batches.

    ``ttl_ms``: processing-time state TTL (None = keep state forever — exact
    dedup; at web scale pass a TTL to bound state size)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs, state):
        if ttl_ms is not None and not state.hasTimedOut:
            state.setTimeoutDuration(ttl_ms)
        yield from _dedup_fn(key, pdfs, state)

    keyed = docs_stream.select(
        F.md5(normalized_text(F.col(text_col))).alias("digest"),
        "url",
        F.col(text_col).alias("text"),
    )
    return keyed.groupBy("digest").applyInPandasWithState(
        fn, OUTPUT_SCHEMA, STATE_SCHEMA, "append", timeout
    )
