"""Distributed inverted-index build: term-bucketed segments of compressed
postings, with explicit head-term skew handling and resumable per-bucket
commits.

Pipeline (generalizes /root/reference/extract_words.py:332-387 ``process_dir``):

  docs(url, text, lang)
    │ mapInPandas extract+tokenize+per-doc tf (narrow, NO token shuffle —
    │ the UDTF's output is already the forward index); n_docs/avgdl
    │ observed during the doc_map write (no separate stats job)
  forward(url, doc_id, term, tf, doc_len)  → parquet checkpoint (+ doc_map)
    │ groupBy(term_id=xxhash64(term), range_salt(doc_id)) collect_list —
    │ SHUFFLE 1: fixed-width numerics only (no term strings), pre-grouped
    │ arrays into a mapInPandas encoder (one Arrow row per encode unit)
  runs(term_id, salt, encoded run)        ← head-term skew bounded by salt
    │ cogroup(term_id) with the vocabulary dim (term, bucket, term_id) —
    │ SHUFFLE 2 of COMPRESSED bytes; the dim rides the same shuffle and
    │ re-attaches the term string; a term_id collision (~v²/2⁶⁵) fails the
    │ job with a marker error and the driver re-runs string-keyed
  segments(term, bucket, df, cf, doc_bytes, tf_bytes, blocks...)
    │ write partitionBy(bucket), dynamic partition overwrite
  manifest: one JSON commit per bucket (index/manifest.py; metrics from
  parquet footers driver-side — no Spark job)

Skew design (north_rule "explicit salting for head terms"): the salt is a
doc_id RANGE (top bits of the uniform xxhash64 doc id), not a hash — so the
per-salt runs of one term are disjoint, ordered ranges. The merge stage
therefore concatenates encoded runs WITHOUT decoding: block-local deltas make
every block self-contained; only block byte-offsets are rebased. A "the"-type
term at web scale costs S bounded encode tasks + one cheap byte-concat task.

encode_mode="mapside" (opt-in, $WICS_ENCODE_MODE — MEASURED AND NOT THE
DEFAULT: on this corpus it loses ~1.7× end-to-end; see the round-6 section
of BENCH/BASELINE.md for the A/B and the group-count-explosion root cause.
Kept because the tradeoff is corpus- and fabric-dependent — it removes the
posting-grain shuffle entirely, which a real multi-node network may value
more than loopback netty does): SHUFFLE 1 disappears.
The DOCS are hash-partitioned on their range salt before tokenize (a
shuffle of one row per document instead of one per posting — ~2 orders of
magnitude fewer rows), the forward checkpoint is written doc_id-sorted
within partitions, and the encoder runs as mapInPandas directly over the
forward SCAN: each read split groups its rows by (term_id, salt) in numpy
and emits finished runs. Only compressed runs ever shuffle (the cogroup
with the vocabulary dim). Correctness rests on run-range disjointness:
partition purity holds at the FINE salt granularity the docs repartition
keyed on (hash partitioning scatters the fine ranges of a coarse salt
across partitions, so purity does NOT lift to coarse n_salts — the encoder
therefore cuts runs at the fine boundaries recorded in the _MAPSIDE marker
and labels them with the enclosing coarse salt); fine-range-per-partition
plus within-file doc order means any read split yields doc-contiguous,
split-disjoint runs; the merge orders runs by (salt, first_doc) and
verifies disjointness, falling back to the string-keyed global re-group on
violation (e.g. a legacy unsorted checkpoint). Fine ranges nest inside
coarse ranges, so run cuts land on coarse-salt boundaries or inside one
salt — the block/salt alignment query_topk's range slicing needs is
preserved.

doc_id = xxhash64(url): deterministic, shuffle-free assignment. (At 10^12
docs, expect ~3e4 birthday collisions across 2^64 — acceptable for ranking;
a dense-id mode would add a sort. Colliding urls are AGGREGATED per posting
in _encode_run — sum tf, max doc_len — because the codec requires strictly
increasing doc_ids; without that pre-aggregation a collision between two
urls sharing a term would crash the encode task.)
"""

from __future__ import annotations

import datetime as dt
import os
import threading
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.codec import EncodedPostings, encode_postings
from ..operators.extract import tokenize, tokenize_tf
from . import manifest as mf

# Positional-store schema generations: v1 = (bucket, doc_id, term, line_ids),
# v2 adds tok_ids (doc-local token ordinals for index-backed phrase search).
# Recorded in stats.json so the incremental merge can refuse to append v2
# rows into a v1 store — a mixed-schema parquet directory read without
# mergeSchema infers from a sampled footer and silently drops pre-upgrade
# documents from phrase results.
POSITIONS_SCHEMA_VERSION = 2

# Read schema of the positional store (v2 shape). Used wherever a read must
# also serve a FILE-LESS store (every doc deleted + compacted): explicit
# schemas skip parquet inference, and a pure-v1 store read through this
# schema surfaces tok_ids as all-null — which is exactly what the schema
# gates test for.
POSITIONS_READ_SCHEMA = (
    "bucket int, doc_id long, term string, "
    "line_ids array<int>, tok_ids array<int>"
)

SEGMENT_SCHEMA = (
    "term string, bucket int, df long, cf long, "
    "doc_bytes binary, tf_bytes binary, dl_bytes binary, "
    "first_doc array<long>, last_doc array<long>, n array<int>, "
    "doc_off array<long>, tf_off array<long>, dl_off array<long>, "
    "max_impact array<float>, max_impact_all float"
)

_RUN_SCHEMA = (
    "term string, salt int, df long, cf long, "
    "doc_bytes binary, tf_bytes binary, dl_bytes binary, "
    "first_doc array<long>, last_doc array<long>, n array<int>, "
    "doc_off array<long>, tf_off array<long>, dl_off array<long>, "
    "max_impact array<float>"
)

# Numeric-keyed twin of _RUN_SCHEMA for the batch build's hot path: the
# encode shuffle + its Arrow surface carry term_id = xxhash64(term) instead
# of the term string, so every shuffled/transferred column is fixed-width
# (measured: the per-posting string column dominated the Arrow
# serialize/convert cost of the encode stage — pandas string conversion
# allocates a Python object per row, numerics are zero-copy). The string
# comes back via a vocabulary dim cogrouped into the (already-happening)
# merge shuffle; a driver-side guard falls back to the string path on the
# ~v²/2⁶⁵ chance of a vocabulary hash collision.
_RUN_SCHEMA_ID = (
    "term_id long, salt int, df long, cf long, "
    "doc_bytes binary, tf_bytes binary, dl_bytes binary, "
    "first_doc array<long>, last_doc array<long>, n array<int>, "
    "doc_off array<long>, tf_off array<long>, dl_off array<long>, "
    "max_impact array<float>"
)


def range_salt(doc_id_col, n_salts: int):
    """Range-based salt over the full signed-int64 doc-id space: arithmetic
    shift of the top bits plus an offset, so salt order == SIGNED doc-id
    order (the merge stage concatenates runs by salt and relies on this).
    Requires n_salts a power of two."""
    bits = int(n_salts).bit_length() - 1
    assert (1 << bits) == n_salts, "n_salts must be a power of two"
    if n_salts == 1:
        # shiftright by 64 is a mod-64 no-op on the JVM — everything is one range
        return F.lit(0)
    return (
        F.shiftright(doc_id_col.cast("long"), 64 - bits) + (n_salts // 2)
    ).cast("int")


def _encode_unsorted(ids, tfs, dls, avgdl: float) -> EncodedPostings:
    """Sort by doc_id and encode; xxhash64(url) birthday collisions are
    aggregated per doc_id (sum tf, max doc_len) — encode_postings requires
    strictly increasing ids and would otherwise assert out the task."""
    order = np.argsort(ids, kind="mergesort")
    ids, tfs, dls = ids[order], tfs[order], dls[order]
    if ids.size > 1 and (ids[1:] == ids[:-1]).any():
        uniq, inv = np.unique(ids, return_inverse=True)
        tf_agg = np.zeros(uniq.size, dtype=tfs.dtype)
        np.add.at(tf_agg, inv, tfs)
        dl_agg = np.zeros(uniq.size, dtype=dls.dtype)
        np.maximum.at(dl_agg, inv, dls)
        ids, tfs, dls = uniq, tf_agg, dl_agg
    return encode_postings(ids, tfs, dls, avgdl)


def _enc_to_run_row(key: str, term, salt: int, enc: EncodedPostings) -> dict:
    return {
        key: term,
        "salt": salt,
        "df": enc.df,
        "cf": enc.cf,
        "doc_bytes": enc.doc_bytes,
        "tf_bytes": enc.tf_bytes,
        "dl_bytes": enc.dl_bytes,
        "first_doc": enc.first_doc.tolist(),
        "last_doc": enc.last_doc.tolist(),
        "n": enc.n.tolist(),
        "doc_off": enc.doc_off.tolist(),
        "tf_off": enc.tf_off.tolist(),
        "dl_off": enc.dl_off.tolist(),
        "max_impact": enc.max_impact.tolist(),
    }


def _encode_run(avgdl: float, key: str = "term"):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf[key].iloc[0]
        salt = int(pdf["salt"].iloc[0])
        enc = _encode_unsorted(
            pdf["doc_id"].to_numpy(),
            pdf["tf"].to_numpy(),
            pdf["doc_len"].to_numpy(),
            avgdl,
        )
        return pd.DataFrame([_enc_to_run_row(key, term, salt, enc)])

    return fn


_RUN_COLS_ID = [f.strip().split()[0] for f in _RUN_SCHEMA_ID.split(",")]


def _encode_rows(avgdl: float):
    """mapInPandas encoder over PRE-GROUPED rows — one input row per
    (term_id, salt) carrying aligned doc_ids/tfs/dls arrays packed by a
    JVM-side collect_list aggregation. Compared with groupBy.applyInPandas
    over raw posting rows, the Arrow surface transfers one row per encode
    unit instead of one per posting, and the per-partition sort-by-group-key
    that FlatMapGroupsInPandas requires disappears (the hash aggregate
    already grouped). Head-term skew stays bounded: the aggregation buffers
    exactly the per-(term, salt) range the salt design caps, and Spark's
    ObjectHashAggregate falls back to sort-based aggregation with spill
    under memory pressure."""

    def fn(it):
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                enc = _encode_unsorted(
                    np.asarray(row.doc_ids, dtype=np.int64),
                    np.asarray(row.tfs, dtype=np.int64),
                    np.asarray(row.dls, dtype=np.int64),
                    avgdl,
                )
                out.append(
                    _enc_to_run_row(
                        "term_id", int(row.term_id), int(row.salt), enc
                    )
                )
            yield pd.DataFrame(out, columns=_RUN_COLS_ID)

    return fn


def _next_pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 1).bit_length()


def _encode_mapside(avgdl: float, n_salts: int, fine_salts: int | None = None):
    """mapInPandas encoder over FORWARD-SCAN partitions — the mapside mode's
    replacement for the posting shuffle + collect_list aggregate: each read
    split groups its own rows by (term_id, FINE salt) with one numpy lexsort
    and emits finished runs labeled with the COARSE salt, so the only thing
    that ever shuffles is compressed run blobs (the cogroup with the
    vocabulary dim).

    Groups are cut at the FINE salt boundaries the docs repartition used
    (recorded in the forward's _MAPSIDE marker), not at the coarse n_salts:
    hash-repartitioning by fine salt puts each fine range wholly inside ONE
    partition file, but scatters the several fine ranges of one coarse salt
    across partitions — a split grouped at coarse granularity could emit a
    run spanning a gap owned by another partition, tripping the merge's
    overlap guard and silently demoting every multi-partition build to the
    string-keyed fallback (round-6 advice #1). A fine range lives in one
    doc-sorted file, so fine-cut runs are doc-contiguous and disjoint across
    splits by construction; fine ranges nest inside coarse ranges (both
    powers of two, fine >= coarse), so no run straddles a coarse-salt
    boundary and query_topk's range slicing invariant is preserved.
    Disjointness is still VERIFIED at merge by _concat_run_rows. Memory is
    bounded by the parquet split size (spark.sql.files.maxPartitionBytes),
    same order as the grouped path's per-(term, salt) aggregation buffers."""
    if fine_salts is None or fine_salts < n_salts:
        fine_salts = n_salts
    boundaries = _salt_boundaries(fine_salts)
    coarse_boundaries = _salt_boundaries(n_salts)

    def fn(it):
        frames = list(it)
        if not frames:
            return
        pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
        tid = pdf["term_id"].to_numpy()
        ids = pdf["doc_id"].to_numpy()
        tfs = pdf["tf"].to_numpy()
        dls = pdf["doc_len"].to_numpy()
        fsalts = np.searchsorted(boundaries, ids, side="right").astype(
            np.int32
        )  # == range_salt(doc_id, fine_salts), numpy twin
        order = np.lexsort((ids, fsalts, tid))
        tid, ids, tfs, dls, fsalts = (
            tid[order], ids[order], tfs[order], dls[order], fsalts[order]
        )
        change = (
            np.flatnonzero(
                (tid[1:] != tid[:-1]) | (fsalts[1:] != fsalts[:-1])
            )
            + 1
        )
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [tid.size]))
        out = []
        for s, e in zip(starts, ends):
            enc = _encode_unsorted(ids[s:e], tfs[s:e], dls[s:e], avgdl)
            salt = int(
                np.searchsorted(coarse_boundaries, ids[s], side="right")
            )  # coarse label: the fine range nests inside this coarse range
            out.append(
                _enc_to_run_row("term_id", int(tid[s]), salt, enc)
            )
            if len(out) >= 4096:
                yield pd.DataFrame(out, columns=_RUN_COLS_ID)
                out = []
        if out:
            yield pd.DataFrame(out, columns=_RUN_COLS_ID)

    return fn


def _concat_run_rows(pdf: pd.DataFrame) -> dict:
    """Byte-concatenate a term's encoded salt runs (disjoint, ordered doc-id
    ranges — see module docstring) without decoding; block offsets rebased.

    Runs order by (salt, first doc): the grouped path emits one run per
    salt (first_doc is a no-op tie-break), the mapside path can emit
    several doc-contiguous runs inside one salt (one per read split).
    Disjointness is VERIFIED, not assumed — an overlap (legacy unsorted
    forward, colliding doc_ids straddling a split) raises a marker error
    the driver converts into the always-correct string-keyed rebuild."""
    pdf = pdf.assign(
        _fd=pdf["first_doc"].map(lambda a: int(a[0]))
    ).sort_values(["salt", "_fd"])
    prev_last = None
    for fd, row_last in zip(pdf["_fd"], pdf["last_doc"]):
        if prev_last is not None and fd <= prev_last:
            raise ValueError(
                f"encoded runs overlap: first_doc {fd} <= prior "
                f"last_doc {prev_last}"
            )
        prev_last = int(row_last[-1])
    doc_bytes = b"".join(pdf["doc_bytes"])
    tf_bytes = b"".join(pdf["tf_bytes"])
    dl_bytes = b"".join(pdf["dl_bytes"])
    first_doc, last_doc, n = [], [], []
    doc_off, tf_off, dl_off, maxi = [], [], [], []
    dbase = tbase = lbase = 0
    for row in pdf.itertuples(index=False):
        first_doc.extend(row.first_doc)
        last_doc.extend(row.last_doc)
        n.extend(row.n)
        doc_off.extend(int(o) + dbase for o in row.doc_off)
        tf_off.extend(int(o) + tbase for o in row.tf_off)
        dl_off.extend(int(o) + lbase for o in row.dl_off)
        maxi.extend(row.max_impact)
        dbase += len(row.doc_bytes)
        tbase += len(row.tf_bytes)
        lbase += len(row.dl_bytes)
    return {
        "df": int(pdf["df"].sum()),
        "cf": int(pdf["cf"].sum()),
        "doc_bytes": doc_bytes,
        "tf_bytes": tf_bytes,
        "dl_bytes": dl_bytes,
        "first_doc": first_doc,
        "last_doc": last_doc,
        "n": n,
        "doc_off": doc_off,
        "tf_off": tf_off,
        "dl_off": dl_off,
        "max_impact": maxi,
        "max_impact_all": float(max(maxi)),
    }


def _merge_runs(n_buckets: int):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf["term"].iloc[0]
        merged = _concat_run_rows(pdf)
        # stable bucket assignment: same function as the Spark-side bucketing
        return pd.DataFrame(
            [{"term": term, "bucket": _py_bucket(term, n_buckets), **merged}]
        )

    return fn


_SEGMENT_COLS = [f.strip().split()[0] for f in SEGMENT_SCHEMA.split(",")]


def _term_id_expr(col):
    """Numeric surrogate key for the encode/merge shuffle (hot path keys
    every per-posting shuffle column fixed-width). Module-level so tests can
    monkeypatch it to a tiny range and force the collision fallback — the
    hot path's only error-recovery branch, which would otherwise never run."""
    return F.xxhash64(col)


def _is_term_id_collision(exc: BaseException) -> bool:
    """True iff a failed Spark job carries ``_merge_runs_dim``'s collision
    marker. Matched on the message substring because the task's ValueError
    crosses the JVM boundary wrapped in PythonException text; the marker
    string is pinned by tests/test_index_build.py so a Spark upgrade that
    truncates error text is caught as a test failure, not silent dead code."""
    return "term_id collision" in str(exc)


def _is_run_overlap(exc: BaseException) -> bool:
    """True iff a failed merge carries ``_concat_run_rows``'s run-overlap
    marker (same JVM-boundary substring matching as the collision marker)."""
    return "encoded runs overlap" in str(exc)


def _merge_runs_dim():
    """Cogrouped merge for the term_id-keyed batch build: ``left`` carries a
    term's encoded runs (term_id-keyed), ``right`` exactly one vocabulary-dim
    row (term_id, term, bucket — bucket computed JVM-side by bucket_expr).
    The dim rides the merge shuffle that happens anyway, so the term string
    is never a per-posting shuffle/Arrow column and the segment blobs are
    shuffled exactly once."""

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            # dim-only key cannot happen (dim derives from the same forward
            # rows) — but return the right shape defensively
            return pd.DataFrame([], columns=_SEGMENT_COLS)
        if len(right) != 1:
            # two distinct terms hashed to one term_id (~v²/2⁶⁵ per build,
            # the birthday approximation v²/2/2⁶⁴):
            # their postings were merged at encode, unrecoverable in-job —
            # fail the job; the driver catches this marker and re-runs the
            # segments build on the always-correct string-keyed path. A
            # task-level detector beats a driver-side pre-check: the
            # pre-check cost a whole extra pass over forward on every build
            # to guard against a once-per-many-petabytes event.
            raise ValueError(
                f"term_id collision: {sorted(right['term'].tolist())!r}"
            )
        merged = _concat_run_rows(left)
        return pd.DataFrame(
            [
                {
                    "term": right["term"].iloc[0],
                    "bucket": int(right["bucket"].iloc[0]),
                    **merged,
                }
            ]
        )[_SEGMENT_COLS]

    return fn


def _salt_boundaries(n_salts: int) -> np.ndarray:
    """Doc-id range boundaries of the build's salt layout (n_salts-1 cut
    points over the signed int64 space; empty for n_salts == 1)."""
    bits = int(n_salts).bit_length() - 1
    return np.asarray(
        [(s - n_salts // 2) << (64 - bits) for s in range(1, n_salts)],
        dtype=np.int64,
    )


def encode_salt_aligned(ids, tfs, dls, avgdl: float, boundaries: np.ndarray):
    """Encode sorted postings with each salt range as its OWN run, runs
    byte-concatenated — no block straddles a range boundary, the invariant
    query_topk's distributed range slicing depends on (the batch build gets
    it from per-(term, salt) encode tasks; re-encoders — incremental merge,
    tombstone purge — get it here)."""
    from ..operators.codec import concat_encoded

    cuts = np.searchsorted(ids, boundaries)
    runs = []
    prev = 0
    for c in list(cuts) + [ids.size]:
        if c > prev:
            runs.append(
                encode_postings(ids[prev:c], tfs[prev:c], dls[prev:c], avgdl)
            )
        prev = c
    return concat_encoded(runs)


def segment_row(term: str, n_buckets: int, enc: EncodedPostings) -> dict:
    """An EncodedPostings as a SEGMENT_SCHEMA row dict."""
    return {
        "term": term,
        "bucket": _py_bucket(term, n_buckets),
        "df": enc.df,
        "cf": enc.cf,
        "doc_bytes": enc.doc_bytes,
        "tf_bytes": enc.tf_bytes,
        "dl_bytes": enc.dl_bytes,
        "first_doc": enc.first_doc.tolist(),
        "last_doc": enc.last_doc.tolist(),
        "n": enc.n.tolist(),
        "doc_off": enc.doc_off.tolist(),
        "tf_off": enc.tf_off.tolist(),
        "dl_off": enc.dl_off.tolist(),
        "max_impact": enc.max_impact.tolist(),
        "max_impact_all": float(enc.max_impact.max()),
    }


def _py_bucket(term: str, n_buckets: int) -> int:
    """Python twin of the bucket expression — crc32-based so both sides agree
    without a JVM call."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_buckets


def bucket_expr(term_col, n_buckets: int):
    return (F.crc32(term_col.cast("binary")) % n_buckets).cast("int")


@dataclass
class BuildResult:
    index_dir: str
    n_docs: int
    avgdl: float
    built_buckets: list[int]
    skipped_buckets: list[int]
    # wall seconds per build phase (forward tokenize+write, segments
    # encode+merge+commit) — scaling-bench attribution telemetry; phases a
    # resume skipped are absent
    phase_seconds: dict = field(default_factory=dict)


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    n_buckets: int = 32,
    n_salts: int = 8,
    overwrite: bool = False,
    tokens: DataFrame | None = None,
    with_positions: bool = False,
    lemmatizer=None,
    avgdl_override: float | None = None,
    encode_mode: str | None = None,
) -> BuildResult:
    """Build (or resume) the inverted index for ``docs`` at ``index_dir``.

    Resume semantics: buckets already committed in the manifest are not
    rebuilt (left-anti against the manifest, ST1); doc stats are rebuilt only
    when absent. Kill-and-rerun converges to the identical index
    (tested in tests/test_index_build.py).

    ``with_positions=True`` additionally writes the positional store —
    (doc_id, term, line_ids sorted-with-duplicates) — the exact analog of the
    reference's ``wsid`` posting lists (extract_words.py:195-196,222-228),
    bucketed like the segments for pruned occurrence lookups.

    ``encode_mode`` (default $WICS_ENCODE_MODE or "grouped"): "grouped" is
    the collect_list-shuffle encode path; "mapside" encodes runs inside the
    forward scan and shuffles only compressed blobs (module docstring).
    Mapside engages on fresh tokenize builds and on resumes over a
    mapside-written forward (the checkpoint carries a layout marker);
    anywhere its preconditions don't hold it silently uses grouped.
    """
    if overwrite:
        mf.clear(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    # Bound the shuffle straggler tail for the build's two applyInPandas
    # shuffles: with exactly one task per slot the longest (term, salt) group
    # — a head term — parks its whole wave on one straggler. 4× finer tasks
    # cap that tail at ~25% of a wave; AQE coalesces anything oversized.
    # Restored on exit: interactive queries measurably prefer coarser tasks.
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(max(int(prev_shuffle), 4 * spark.sparkContext.defaultParallelism)),
    )
    # AQE's 64MB advisory coalesces the build's modest encode shuffle below
    # the core count (measured: ~150MB shuffle -> 2-3 post-coalesce tasks on
    # 8 slots; 8MB advisory recovered ~20% of the encode+merge stage wall).
    # Restored on exit — interactive queries keep the session default.
    prev_advisory = spark.conf.get(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
    # The tokenize stage is the build's Python-heavy map: its parallelism is
    # the INPUT partition count, and parquet's size-based split packing turns
    # a small-file corpus into 1-4 read partitions (measured: a 10k-doc
    # corpus tokenized on ~2 tasks of a 32-slot session — the stage ran near
    # serial). When the scan can't feed every slot, widen it explicitly; at
    # web scale input splits outnumber slots and this no-ops. Checked only
    # when tokenize will actually run: a fresh forward build, OR a
    # with_positions resume whose positions store is missing (forward
    # present but tokenize(docs) still runs for the positional pass). A
    # pure forward resume must not touch (or even plan over) the docs
    # input.
    par = spark.sparkContext.defaultParallelism
    fresh_forward = not _exists(os.path.join(index_dir, "forward"))
    will_tokenize = fresh_forward or (
        with_positions and not _exists(mf.data_dir(index_dir, "positions"))
    )
    encode_mode = encode_mode or os.environ.get(
        "WICS_ENCODE_MODE", "grouped"
    )
    mapside_fine_salts: int | None = None
    if encode_mode == "mapside" and fresh_forward and tokens is None:
        # mapside precondition: forward partitions must be PURE at the
        # granularity the encoder groups at. Key the docs shuffle on a FINER
        # nested power-of-two salt so ~4 ranges land per partition (balance
        # without a sampling pass — doc_id is a uniform hash). NOTE: purity
        # holds only at this FINE granularity — hash repartitioning scatters
        # the fine ranges of one coarse salt across partitions, so the
        # encoder must also CUT its runs at these fine boundaries (the count
        # is recorded in the _MAPSIDE marker; round-6 advice #1). Coarse
        # n_salts stays the run LABEL/merge-order key. This replaces the
        # parallelism repartition below: one row per DOCUMENT shuffles,
        # never one per posting.
        p_out = max(2 * par, docs.rdd.getNumPartitions())
        mapside_fine_salts = max(_next_pow2(4 * p_out), n_salts)
        docs = docs.repartition(
            p_out,
            range_salt(F.xxhash64(F.col("url")), mapside_fine_salts),
        )
    elif will_tokenize and docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(2 * par)
    try:
        return _build_index_inner(
            spark, docs, index_dir, n_buckets, n_salts,
            tokens, with_positions, lemmatizer, avgdl_override,
            encode_mode=encode_mode,
            mapside_fine_salts=mapside_fine_salts,
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", prev_advisory
        )


def _build_index_inner(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    n_buckets: int,
    n_salts: int,
    tokens: DataFrame | None,
    with_positions: bool,
    lemmatizer,
    avgdl_override: float | None = None,
    encode_mode: str = "grouped",
    mapside_fine_salts: int | None = None,
) -> BuildResult:

    tok_name = "wics-v1" if lemmatizer is None else (
        f"wics-v1+{getattr(lemmatizer, '__name__', lemmatizer)}"
    )
    # resume into a previously-compacted index: honor its committed
    # generation pointer so the stores being appended/read are the live ones
    try:
        generation = int(mf.read_stats(index_dir).get("generation", 0))
    except FileNotFoundError:
        generation = 0
    doc_map_path = mf.data_dir(index_dir, "doc_map", generation)
    forward_path = os.path.join(index_dir, "forward")

    # The forward index (url, term, tf, doc_len) is aggregated INSIDE the
    # extract UDTF (per-document pandas groupby) — raw token rows are never
    # shuffled, the map output IS the forward index. It is materialized to
    # parquet once: the scratch parquet doubles as a resume checkpoint and
    # as the engine's term-doc matrix artifact, and both downstream passes
    # (doc stats, postings) read it instead of re-tokenizing.
    from pyspark.sql import Observation

    n_docs = avgdl = None
    phases: dict = {}
    fresh_forward = not _exists(forward_path)
    if fresh_forward:
        if tokens is None:
            # doc_markers: one (term='', tf=0) row per document lets this
            # single write pass ALSO carry the corpus stats (observed below)
            # and the doc_map content (marker-scan later) — the separate
            # groupBy-doc_map job the build used to run was pure fixed
            # orchestration floor, paid at every parallelism level
            fwd = tokenize_tf(docs, lemmatizer=lemmatizer, doc_markers=True)
        else:
            # int casts: the fresh-forward re-read below uses an explicit
            # 'tf int, doc_len int' schema (matching tokenize_tf's Arrow
            # output); count(*)/window-sum are INT64 and parquet's vectorized
            # reader refuses INT64→int32, so a fresh tokens= build would
            # crash at the segments scan without them (round-6 advice #2)
            base_fwd = (
                tokens.groupBy("url", "term")
                .agg(F.count("*").cast("int").alias("tf"))
                .withColumn(
                    "doc_len",
                    F.sum("tf").over(
                        __import__("pyspark").sql.Window.partitionBy("url")
                    ).cast("int"),
                )
                .select("url", "term", "tf", "doc_len")
            )
            markers = base_fwd.select("url", "doc_len").distinct().select(
                "url", F.lit("").alias("term"),
                F.lit(0).alias("tf"), "doc_len",
            )
            fwd = base_fwd.unionByName(
                markers.select("url", "term", "tf", "doc_len")
            )
        # persist doc_id alongside: the encode scan then prunes the url
        # string column entirely (8 fixed bytes on disk buy a string-free
        # hot-path scan; computed JVM-side during this write pass)
        fwd = fwd.withColumn("doc_id", F.xxhash64(F.col("url")))
        if encode_mode == "mapside" and tokens is None:
            # mapside layout: docs arrived salt-partitioned (build_index);
            # a within-partition doc_id sort (no shuffle) makes any future
            # parquet READ SPLIT of these files doc-contiguous, so mapside
            # runs stay disjoint even when a file splits across tasks
            fwd = fwd.sortWithinPartitions("doc_id")
        # N and avgdl observed DURING the forward write — from here the
        # segments job has everything it needs, so doc_map drops off the
        # build's critical path entirely (written concurrently below)
        obs = Observation()
        fwd = fwd.observe(
            obs,
            F.sum(
                F.when(F.col("term") == "", 1).otherwise(0)
            ).alias("n_docs"),
            F.sum(
                F.when(F.col("term") == "", F.col("doc_len"))
            ).alias("len_sum"),
        )
        t_fwd = time.time()
        fwd.write.mode("overwrite").parquet(forward_path)
        phases["forward_s"] = round(time.time() - t_fwd, 2)
        if encode_mode == "mapside" and tokens is None:
            # layout marker: a resume may only take the mapside encode path
            # over a forward that really is salt-partitioned + doc-sorted;
            # fine_salts records the repartition granularity the encoder
            # must cut runs at (partition purity holds at FINE, not coarse)
            import json as _json

            with open(os.path.join(forward_path, "_MAPSIDE"), "w") as fh:
                fh.write(_json.dumps({
                    "layout": "range_salt+doc_id_sorted",
                    "fine_salts": int(mapside_fine_salts or n_salts),
                }))
        got = obs.get
        n_docs = int(got["n_docs"])
        avgdl = float(got["len_sum"]) / max(n_docs, 1)
    if fresh_forward:
        # explicit schema: skips the footer schema-inference job (we just
        # wrote these files; the schema is known)
        forward = spark.read.schema(
            "url string, term string, tf int, doc_len int, doc_id long"
        ).parquet(forward_path)
    else:
        # resume: infer — a legacy checkpoint may lack doc_id, and an
        # explicit schema would surface the gap as silent nulls
        forward = spark.read.parquet(forward_path)

    # ---- doc stats + doc_map (A4/A7): built once, reused on resume ---------
    doc_map_thread = None
    doc_map_errs: list[BaseException] = []
    if not _exists(doc_map_path):
        has_markers = fresh_forward or bool(
            forward.where(F.col("term") == "").limit(1).count()
        )
        if has_markers:
            # doc_map IS the marker rows: a narrow pushdown scan-and-write,
            # no shuffle. Overlapped with the segments job in a thread
            # (Spark schedules concurrent jobs from separate driver
            # threads); joined before positions/stats — resume recomputes
            # whichever of doc_map/segments a crash left missing, so the
            # commit order between them is free.
            doc_map_src = forward.where(F.col("term") == "").select(
                "doc_id", "url", "doc_len"
            )
            if n_docs is None:
                # resume over a marker-bearing forward: stats from markers
                n_docs, avgdl = doc_map_src.agg(
                    F.count("*"), F.avg("doc_len")
                ).collect()[0]

            def _write_doc_map() -> None:
                try:
                    doc_map_src.write.mode("overwrite").parquet(doc_map_path)
                except BaseException as e:  # noqa: BLE001 — re-raised on join
                    doc_map_errs.append(e)

            doc_map_thread = threading.Thread(
                target=_write_doc_map, name="wics-doc-map-write", daemon=True
            )
            doc_map_thread.start()
        else:
            # legacy forward checkpoint (pre-marker build being resumed):
            # derive doc_map the original way, stats observed during write
            obs = Observation()
            doc_map = (
                forward.groupBy("url")
                .agg(F.max("doc_len").alias("doc_len"))
                .withColumn("doc_id", F.xxhash64(F.col("url")))
                .select("doc_id", "url", "doc_len")
                .observe(
                    obs,
                    F.count(F.lit(1)).alias("n_docs"),
                    F.avg("doc_len").alias("avgdl"),
                )
            )
            doc_map.write.mode("overwrite").parquet(doc_map_path)
            got = obs.get
            n_docs, avgdl = got["n_docs"], got["avgdl"]
    if n_docs is None:
        n_docs, avgdl = spark.read.parquet(doc_map_path).agg(
            F.count("*"), F.avg("doc_len")
        ).collect()[0]
    avgdl = float(avgdl)
    if avgdl_override is not None:
        # rebuild with PINNED global stats — the frozen-avgdl maintenance
        # policy (streaming/incremental.py module docstring): a rebuild over
        # a pruned corpus (e.g. post-deletion) stays score-comparable with
        # the incremental index it replaces
        avgdl = float(avgdl_override)

    done = set(mf.completed_buckets(index_dir))
    todo = [b for b in range(n_buckets) if b not in done]
    if todo:
        # doc_id = xxhash64(url) is a PURE FUNCTION and doc_len is already a
        # forward-index column, so attaching them is a projection — the
        # historical forward ⋈ doc_map join here shuffled the entire
        # forward table on url for values derivable in place (measured: the
        # encode+merge stage ladder at 2→8 cores improves, and a full
        # shuffle of the fact table disappears from the plan).
        # Newer forward checkpoints persist doc_id so this scan doesn't even
        # read the url strings; older ones recompute it in place.
        base = (
            forward
            if "doc_id" in forward.columns
            else forward.withColumn("doc_id", F.xxhash64(F.col("url")))
        ).where(
            # doc-marker rows (term='') are doc_map/stats content, not
            # postings; the predicate pushes to the parquet scan and no-ops
            # on marker-free legacy checkpoints
            F.col("term") != ""
        ).withColumn("bucket", bucket_expr(F.col("term"), n_buckets)).where(
            F.col("bucket").isin(todo)  # resume: only missing buckets
        )
        def _write_segments(segments: DataFrame) -> None:
            (
                segments.repartition("bucket")
                # sort by term within each bucket file: parquet row-group
                # min/max statistics then prune term lookups inside a
                # bucket, not just across buckets (query path pushes term
                # equality to the scan)
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(os.path.join(index_dir, "segments"))
            )

        def _vocab_dim() -> DataFrame:
            # vocabulary dim (term, bucket, term_id — one row per distinct
            # in-scope term): computed INSIDE the segments job so its scan
            # pipelines with the encode map; rides the merge cogroup's
            # existing shuffle (no per-posting term strings anywhere)
            return (
                base.select("term")
                .distinct()
                .withColumn("bucket", bucket_expr(F.col("term"), n_buckets))
                .withColumn("term_id", _term_id_expr(F.col("term")))
            )

        def _encode_merge_mapside() -> DataFrame:
            # mapside: runs come straight out of the forward scan (module
            # docstring) — no posting-grain shuffle exists in this plan at
            # all; the groupBy below shuffles compressed run blobs only.
            # Run-cut granularity comes from the forward's _MAPSIDE marker
            # (the fine salt count its repartition used); a legacy marker
            # without the key falls back to coarse cuts, where the merge's
            # overlap guard still protects correctness.
            import json as _json

            try:
                with open(os.path.join(forward_path, "_MAPSIDE")) as fh:
                    fine = int(
                        _json.load(fh).get("fine_salts", n_salts)
                    )
            except (OSError, ValueError):
                fine = n_salts
            src = base.select(
                _term_id_expr(F.col("term")).alias("term_id"),
                "doc_id", "tf", "doc_len",
            )
            runs = src.mapInPandas(
                _encode_mapside(avgdl, n_salts, fine), schema=_RUN_SCHEMA_ID
            )
            return (
                runs.groupBy("term_id")
                .cogroup(_vocab_dim().groupBy("term_id"))
                .applyInPandas(_merge_runs_dim(), schema=SEGMENT_SCHEMA)
            )

        def _encode_merge_by_term_id() -> DataFrame:
            # HOT PATH (grouped): every shuffled/Arrow column fixed-width —
            # encode shuffle carries (term_id, doc_id, tf, doc_len, salt)
            # only; bucket and the term string are NOT shuffled per posting
            # (the vocabulary dim re-attaches them at merge).
            dim = _vocab_dim()
            postings_in = base.select(
                _term_id_expr(F.col("term")).alias("term_id"),
                "doc_id", "tf", "doc_len",
            )
            grouped = (
                postings_in.withColumn(
                    "salt", range_salt(F.col("doc_id"), n_salts)
                )
                .groupBy("term_id", "salt")
                # one struct list per group, split back into aligned plain
                # arrays JVM-side (a single aggregate guarantees alignment;
                # three parallel collect_lists would not contractually)
                .agg(
                    F.collect_list(
                        F.struct("doc_id", "tf", "doc_len")
                    ).alias("ps")
                )
                .select(
                    "term_id",
                    "salt",
                    F.col("ps.doc_id").alias("doc_ids"),
                    F.col("ps.tf").alias("tfs"),
                    F.col("ps.doc_len").alias("dls"),
                )
            )
            runs = grouped.mapInPandas(
                _encode_rows(avgdl), schema=_RUN_SCHEMA_ID
            )
            return (
                runs.groupBy("term_id")
                .cogroup(dim.groupBy("term_id"))
                .applyInPandas(_merge_runs_dim(), schema=SEGMENT_SCHEMA)
            )

        def _encode_merge_by_term() -> DataFrame:
            # collision fallback (~v²/2⁶⁵ odds per build, detected by the
            # merge task's marker error): string-keyed shuffles — correct
            # for any vocabulary, strictly slower per-posting string column
            postings_in = base.select("term", "doc_id", "tf", "doc_len")
            runs = (
                postings_in.withColumn(
                    "salt", range_salt(F.col("doc_id"), n_salts)
                )
                .groupBy("term", "salt")
                .applyInPandas(_encode_run(avgdl), schema=_RUN_SCHEMA)
            )
            return runs.groupBy("term").applyInPandas(
                _merge_runs(n_buckets), schema=SEGMENT_SCHEMA
            )

        use_mapside = encode_mode == "mapside" and os.path.exists(
            os.path.join(forward_path, "_MAPSIDE")
        )
        t_seg = time.time()
        try:
            try:
                if use_mapside:
                    # bigger Arrow batches for the scan→encoder hand-off:
                    # the encoder concatenates its split's batches anyway,
                    # and the 512 default (tuned for tokenize) would hand it
                    # thousands of tiny frames. Restored below.
                    prev_arrow = spark.conf.get(
                        "spark.sql.execution.arrow.maxRecordsPerBatch"
                    )
                    spark.conf.set(
                        "spark.sql.execution.arrow.maxRecordsPerBatch",
                        "65536",
                    )
                    try:
                        _write_segments(_encode_merge_mapside())
                    finally:
                        spark.conf.set(
                            "spark.sql.execution.arrow.maxRecordsPerBatch",
                            prev_arrow,
                        )
                else:
                    _write_segments(_encode_merge_by_term_id())
            except Exception as e:  # noqa: BLE001 — marker-matched else raise
                if not (
                    _is_term_id_collision(e)
                    or (use_mapside and _is_run_overlap(e))
                ):
                    raise
                _write_segments(_encode_merge_by_term())
        except BaseException:
            # a failed segments job must not leave the concurrent doc_map
            # write dangling — a same-session retry would race its own
            # _exists check against this thread's in-flight files
            if doc_map_thread is not None:
                doc_map_thread.join()
            raise
        _touch_success(os.path.join(index_dir, "segments"))
        phases["segments_s"] = round(time.time() - t_seg, 2)
        # ---- per-bucket manifest commit (metrics from the written files) ---
        metrics = _bucket_metrics(
            spark, os.path.join(index_dir, "segments"), todo
        )
        for b in todo:
            m = metrics.get(b)
            mf.commit_bucket(
                index_dir,
                b,
                {
                    "n_terms": int(m["n_terms"]) if m else 0,
                    "n_postings": int(m["n_postings"]) if m else 0,
                    "bytes": int(m["bytes"]) if m else 0,
                    "lineage": {
                        "n_docs": int(n_docs),
                        "n_salts": n_salts,
                        "tokenizer": tok_name,
                    },
                },
            )

    # barrier: doc_map must be on disk before the positions join reads it
    # and before stats.json commits the build
    if doc_map_thread is not None:
        doc_map_thread.join()
    if doc_map_errs:
        raise doc_map_errs[0]

    if with_positions:
        positions_path = mf.data_dir(index_dir, "positions", generation)
        stats_extra = {"positions_schema": POSITIONS_SCHEMA_VERSION}
        if not _exists(positions_path):
            doc_map = spark.read.parquet(doc_map_path)
            (
                tokenize(docs, lemmatizer=lemmatizer)
                .groupBy("url", "term")
                .agg(
                    F.array_sort(F.collect_list("line_id")).alias("line_ids"),
                    # doc-local token ordinals: the token-adjacency side of
                    # the store (index-backed phrase queries); line_ids stay
                    # the reference's cue-granular wsid analog
                    F.array_sort(F.collect_list("tok_idx")).alias("tok_ids"),
                )
                .join(doc_map.select("url", "doc_id"), "url")
                .withColumn("bucket", bucket_expr(F.col("term"), n_buckets))
                .select("bucket", "doc_id", "term", "line_ids", "tok_ids")
                .repartition("bucket")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(positions_path)
            )
            _touch_success(positions_path)

    mf.write_stats(
        index_dir,
        {
            "n_docs": int(n_docs),
            "avgdl": avgdl,
            "n_buckets": n_buckets,
            "n_salts": n_salts,
            "built_at": dt.datetime.now(dt.timezone.utc).isoformat(),
            "tokenizer": tok_name,
            "generation": generation,
            **(stats_extra if with_positions else {}),
        },
    )
    return BuildResult(
        index_dir, int(n_docs), avgdl, todo, sorted(done), phases
    )


def _exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _touch_success(path: str) -> None:
    """Partitioned writes under partitionOverwriteMode=dynamic do NOT emit a
    root _SUCCESS marker (Spark commits per-partition via staging). The
    write() call returning IS the commit, so stamp the marker explicitly —
    resume checks (_exists) and compaction migration depend on it. (Caught
    live: a freshly-built positions store had no marker, so compaction
    skipped migrating it and the generation GC deleted it.)"""
    open(os.path.join(path, "_SUCCESS"), "a").close()


def tombstones_path(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones")


def read_tombstone_ids(index_dir: str) -> np.ndarray:
    """Sorted unique tombstoned doc_ids (empty array when none). Driver-side
    pyarrow read, no Spark job: the deleted-docs set is small relative to
    the corpus and ships inside query plans/closures the way the ANN
    centroid literals do; if it ever grows large, run compact_index — the
    physical purge empties it."""
    path = tombstones_path(index_dir)
    if not os.path.isdir(path) or not os.listdir(path):
        return np.empty(0, dtype=np.int64)
    import pyarrow.dataset as ds

    tbl = ds.dataset(path, format="parquet").to_table(columns=["doc_id"])
    if tbl.num_rows == 0:
        return np.empty(0, dtype=np.int64)
    return np.unique(
        tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    )


def delete_docs(spark: SparkSession, index_dir: str, urls) -> int:
    """Logically delete documents by url (takedowns, re-crawl removals,
    dedup-driven drops — the operations the reference's append-only cache
    cannot express, extract_words.py:372-385). Lucene-style deleted-docs
    model: this appends (doc_id, url) tombstones — queries exclude them
    immediately (IndexHandle.tombstones → the top-k kernels' ``excluded``
    set, anti-joins on the DataFrame paths) and ``compact_index`` performs
    the physical purge (segments decode-filter-re-encode, doc_map/positions
    filtered, tombstones cleared). Idempotent: already-tombstoned and
    unknown urls are no-ops. A deleted url becomes indexable again after
    the next compaction removes it from doc_map (the merge replay gate).
    Returns the number of newly tombstoned documents."""
    stats = mf.read_stats(index_dir)
    generation = int(stats.get("generation", 0))
    doc_map = spark.read.parquet(mf.data_dir(index_dir, "doc_map", generation))
    if isinstance(urls, (list, tuple, set)):
        urls_df = spark.createDataFrame(
            [(u,) for u in sorted(urls)], "url string"
        )
    else:
        urls_df = urls.select("url")
    hit = doc_map.join(urls_df.distinct(), "url", "left_semi").select(
        "doc_id", "url"
    )
    path = tombstones_path(index_dir)
    if os.path.isdir(path) and os.listdir(path):
        hit = hit.join(
            spark.read.parquet(path).select("doc_id"), "doc_id", "left_anti"
        )
    hit = hit.persist()
    n = hit.count()
    if n:
        hit.write.mode("append").parquet(path)
    hit.unpersist()
    return int(n)


def _drop_tombstoned_postings(
    avgdl: float, n_buckets: int, n_salts: int, excluded: np.ndarray
):
    """mapInPandas over segment rows (compaction's physical purge): rows
    whose block [first_doc, last_doc] ranges cannot contain an excluded id
    pass through byte-identical (no decode); affected rows decode, mask, and
    re-encode salt-range aligned with the FROZEN avgdl, recomputing df/cf
    and block max-impact metadata; terms whose postings all vanish drop."""
    from ..operators.codec import decode_postings

    boundaries = _salt_boundaries(n_salts)
    cols = [f.strip().split()[0] for f in SEGMENT_SCHEMA.split(",")]

    def fn(it):
        from .query import _row_to_encoded  # runtime import (no cycle)

        for pdf in it:
            rows = []
            for rec in pdf.to_dict("records"):
                first = np.asarray(rec["first_doc"], dtype=np.int64)
                last = np.asarray(rec["last_doc"], dtype=np.int64)
                pos = np.searchsorted(excluded, first, side="left")
                hit = (pos < excluded.size) & (
                    excluded[np.minimum(pos, excluded.size - 1)] <= last
                )
                if not hit.any():
                    rows.append(rec)
                    continue
                ids, tfs, dls = decode_postings(_row_to_encoded(rec))
                keep = ~np.isin(ids, excluded)
                if not keep.any():
                    continue
                enc = encode_salt_aligned(
                    ids[keep], tfs[keep], dls[keep], avgdl, boundaries
                )
                rows.append(segment_row(rec["term"], n_buckets, enc))
            yield pd.DataFrame(rows, columns=cols)

    return fn


def _bucket_metrics(
    spark: SparkSession, seg_path: str, buckets: list[int]
) -> dict[int, dict]:
    """Manifest metrics for the given bucket partitions of the WRITTEN
    segment store. Computed entirely DRIVER-SIDE from parquet metadata and
    the tiny ``df`` column (pyarrow): n_terms comes from row-group counts
    (no data read), n_postings from the df column only — never the posting
    byte columns, which are the store's entire payload. This used to be a
    Spark job; per-build fixed job overhead is exactly what the scaling
    gate's low-parallelism level cannot amortize. ``bytes`` is the actual
    on-disk size of each committed bucket partition — the honest ops
    metric. (On an object-store deployment this seam swaps for a
    metadata-table query — Iceberg keeps these stats in manifests.)"""
    import pyarrow.dataset as pads

    out: dict[int, dict] = {}
    for b in buckets:
        bucket_dir = os.path.join(seg_path, f"bucket={b}")
        if not os.path.isdir(bucket_dir):
            continue
        files = [
            os.path.join(bucket_dir, f)
            for f in os.listdir(bucket_dir)
            if f.endswith(".parquet")
        ]
        if not files:
            continue
        dset = pads.dataset(files, format="parquet")
        tbl = dset.to_table(columns=["df"])
        if tbl.num_rows == 0:
            continue
        disk = sum(
            os.path.getsize(os.path.join(bucket_dir, f))
            for f in os.listdir(bucket_dir)
        )
        out[b] = {
            "n_terms": int(tbl.num_rows),
            "n_postings": int(
                sum(c.sum().as_py() or 0 for c in tbl.column("df").chunks)
            ),
            "bytes": int(disk),
        }
    return out


def compact_index(
    spark: SparkSession,
    index_dir: str,
    target_docs_per_file: int = 2_000_000,
) -> dict:
    """Generational compaction of the append-mode stores (ST1 maintenance).

    Every incremental merge APPENDS parquet files to doc_map and (per
    affected bucket) to positions: after N micro-batches a bucket's
    positional data is spread across ~N unsorted files and doc_map across
    N+1 — the classic small-files problem, and lost row-group pruning, at
    web scale. Compaction rewrites both stores as generation g+1
    (positions: one term-sorted file per bucket, restoring min/max pruning;
    doc_map: ~``target_docs_per_file`` rows per file), COMMITS the pointer
    with the atomic stats.json replace, then garbage-collects all older
    generations. A crash before the commit leaves only orphan g+1 dirs that
    the next compaction overwrites; readers resolve paths through the
    committed pointer (manifest.data_dir), so a half-written generation is
    never observable. Reload IndexHandles after compacting (same contract
    as after a merge).

    Segments are NOT compacted here: both the batch build and the
    incremental merge already rewrite affected bucket partitions whole
    (dynamic partition overwrite, term-sorted), so their file count is
    bounded by n_buckets."""
    import shutil

    stats = mf.read_stats(index_dir)
    g = int(stats.get("generation", 0))
    new_g = g + 1
    out = {"generation": new_g}

    # tombstones (delete_docs): compaction is the physical purge point —
    # doc_map/positions rows filtered, affected segment terms decode-filter-
    # re-encoded, tombstones cleared LAST (after the commit), so a crash at
    # any point leaves the logical exclusion active and queries correct
    excluded = read_tombstone_ids(index_dir)
    tomb_df = None
    if excluded.size:
        tomb_df = (
            spark.read.parquet(tombstones_path(index_dir))
            .select("doc_id")
            .distinct()
        )
        out["tombstones_purged"] = int(excluded.size)

    doc_map_src = mf.data_dir(index_dir, "doc_map", g)
    doc_map = spark.read.parquet(doc_map_src)
    if tomb_df is not None:
        doc_map = doc_map.join(F.broadcast(tomb_df), "doc_id", "left_anti")
    n_docs = doc_map.count()
    n_files = max(1, -(-n_docs // target_docs_per_file))
    (
        doc_map.repartition(n_files)
        .write.mode("overwrite")
        .parquet(mf.data_dir(index_dir, "doc_map", new_g))
    )
    out["doc_map_files"] = n_files

    migrated = ["doc_map"]

    pos_src = mf.data_dir(index_dir, "positions", g)
    # migrate by DIRECTORY presence, not the _SUCCESS marker: dynamic
    # partition overwrite commits without a root marker (now stamped by
    # _touch_success at every writer, but indexes built before the stamp
    # exist) — and a store that is not migrated must NEVER be GC'd.
    if os.path.isdir(pos_src) and os.listdir(pos_src):
        import glob as _glob

        pos_dst = mf.data_dir(index_dir, "positions", new_g)
        if not _glob.glob(os.path.join(pos_src, "**", "*.parquet"),
                          recursive=True):
            # structurally-empty store (every doc tombstoned): nothing to
            # rewrite, but the new generation must EXIST for readers
            os.makedirs(pos_dst, exist_ok=True)
            _touch_success(pos_dst)
            out["positions_compacted"] = True
            migrated.append("positions")
            pos_src = None  # handled
    if pos_src is not None and os.path.isdir(pos_src) and os.listdir(pos_src):
        pos_dst = mf.data_dir(index_dir, "positions", new_g)
        # mergeSchema: a pre-versioning MIXED store (v1 files without tok_ids
        # plus later v2 appends — the hazard the merge gate in
        # streaming/incremental.py documents) must not be rewritten from one
        # sampled parquet footer, which would drop or null tok_ids before the
        # GC below deletes the only complete copy. The merged read is
        # lossless for every store shape: pure-v1 keeps its schema, mixed
        # keeps v1 rows as null-tok_ids rows, pure-v2 is unchanged.
        pos_df = spark.read.option("mergeSchema", "true").parquet(pos_src)
        if tomb_df is not None:
            pos_df = pos_df.join(F.broadcast(tomb_df), "doc_id", "left_anti")
        (
            pos_df.repartition("bucket")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(pos_dst)
        )
        # a dynamic-overwrite write of zero rows (all rows tombstoned)
        # creates no directory at all — readers still need one to exist
        os.makedirs(pos_dst, exist_ok=True)
        _touch_success(pos_dst)
        out["positions_compacted"] = True
        migrated.append("positions")
        if int(stats.get("positions_schema", 0)) < POSITIONS_SCHEMA_VERSION:
            # grace upgrade: a store written in the tok_ids era but before
            # stats.json carried the positions_schema key loads as v0 — stamp
            # v2 when every row in fact carries tok_ids, so index-backed
            # phrase search keeps working after compaction of such indexes
            # explicit schema: the rewritten store may be FILE-LESS (purge
            # dropped every positions row) and schema inference would raise;
            # an empty store trivially satisfies the all-rows-stamped check
            if "tok_ids" in pos_df.columns and (
                spark.read.schema(POSITIONS_READ_SCHEMA).parquet(pos_dst)
                .where(F.col("tok_ids").isNull())
                .limit(1)
                .count()
                == 0
            ):
                stats["positions_schema"] = POSITIONS_SCHEMA_VERSION

    if excluded.size:
        # physical purge of the postings: rewrite affected buckets (dynamic
        # partition overwrite, same layout as build/merge); untouched rows
        # pass through without decode via the block-metadata prune. Staged
        # through a temp dir — Spark refuses to overwrite a path it is
        # reading — and any bucket whose every term vanished is dropped
        # manually (dynamic overwrite only rewrites buckets present in the
        # output).
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        seg_path = os.path.join(index_dir, "segments")
        seg = spark.read.schema(SEGMENT_SCHEMA).parquet(seg_path)
        old_buckets = sorted(
            int(r["bucket"]) for r in seg.select("bucket").distinct().collect()
        )
        tmp_seg = os.path.join(index_dir, "segments_compact_tmp")
        shutil.rmtree(tmp_seg, ignore_errors=True)
        seg.mapInPandas(
            _drop_tombstoned_postings(
                float(stats["avgdl"]), int(stats["n_buckets"]),
                int(stats["n_salts"]), excluded,
            ),
            schema=SEGMENT_SCHEMA,
        ).write.mode("overwrite").parquet(tmp_seg)
        new_seg = spark.read.parquet(tmp_seg)
        (
            new_seg.repartition("bucket")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(seg_path)
        )
        _touch_success(seg_path)
        new_buckets = {
            int(r["bucket"])
            for r in new_seg.select("bucket").distinct().collect()
        }
        shutil.rmtree(tmp_seg, ignore_errors=True)
        for b in old_buckets:
            if b not in new_buckets:
                shutil.rmtree(
                    os.path.join(seg_path, f"bucket={b}"), ignore_errors=True
                )
        metrics = _bucket_metrics(spark, seg_path, old_buckets)
        for b in old_buckets:
            m = metrics.get(b)
            mf.commit_bucket(
                index_dir,
                b,
                {
                    "n_terms": int(m["n_terms"]) if m else 0,
                    "n_postings": int(m["n_postings"]) if m else 0,
                    "bytes": int(m["bytes"]) if m else 0,
                    "lineage": {
                        "compaction": new_g,
                        "tombstones_purged": int(excluded.size),
                    },
                },
            )
        out["segments_purged_buckets"] = len(old_buckets)

    stats["generation"] = new_g
    stats["n_docs"] = int(n_docs)  # post-purge truth (unchanged without
    # tombstones: doc_map is the source of n_docs either way)
    mf.write_stats(index_dir, stats)  # commit point (atomic replace)

    # GC strictly the MIGRATED stores' older generations — deleting a
    # non-migrated name would destroy its only copy
    for name in migrated:
        for old_g in range(new_g):
            p = mf.data_dir(index_dir, name, old_g)
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
    if excluded.size:
        # everything physically purged and committed — the logical exclusion
        # is no longer needed (a crash before this line just leaves it
        # active against already-absent doc_ids: harmless, cleared next time)
        shutil.rmtree(tombstones_path(index_dir), ignore_errors=True)
    return out
