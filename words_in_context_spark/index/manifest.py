"""Per-partition build manifest: lineage, metrics, resume.

The reference's incremental build skips (lang, file) pairs already present in
its JSON cache (/root/reference/extract_words.py:351-357,372-376) and its WAL
replays appended records on recovery (export.py:34-115). The engine analog is
a manifest directory next to the index: one JSON file per committed bucket —
written only AFTER that bucket's segment partition is fully materialized, so
a crash mid-build leaves at most uncommitted partition dirs which the next run
overwrites (dynamic partition overwrite → idempotent, exactly-once commits).

File-per-bucket (not one mutable blob) means commits are O(1), independent,
and safely concurrent — the property the reference's whole-blob rewrite
(extract_words.py:384-385) lacks.
"""

from __future__ import annotations

import datetime as dt
import json
import os


def manifest_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "_manifest")


def bucket_path(index_dir: str, bucket: int) -> str:
    return os.path.join(manifest_dir(index_dir), f"bucket-{bucket:05d}.json")


def commit_bucket(index_dir: str, bucket: int, metrics: dict) -> None:
    """Atomically record a bucket as committed (write temp + rename)."""
    os.makedirs(manifest_dir(index_dir), exist_ok=True)
    record = {
        "bucket": bucket,
        "status": "committed",
        "committed_at": dt.datetime.now(dt.timezone.utc).isoformat(),
        **metrics,
    }
    path = bucket_path(index_dir, bucket)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f)
    os.replace(tmp, path)


def completed_buckets(index_dir: str) -> dict[int, dict]:
    """bucket → manifest record for every committed bucket."""
    mdir = manifest_dir(index_dir)
    if not os.path.isdir(mdir):
        return {}
    out = {}
    for fname in os.listdir(mdir):
        if not (fname.startswith("bucket-") and fname.endswith(".json")):
            continue
        with open(os.path.join(mdir, fname)) as f:
            rec = json.load(f)
        if rec.get("status") == "committed":
            out[int(rec["bucket"])] = rec
    return out


def data_dir(index_dir: str, name: str, generation: int | None = None) -> str:
    """Path of a generational data store (``doc_map`` / ``positions``).

    Incremental merges APPEND to these stores; compaction rewrites them as
    generation g+1 and commits the pointer via stats.json, so readers resolve
    paths through the committed generation and never observe a half-written
    rewrite. Generation 0 is the bare name (backward compatible with
    pre-generation indexes); g > 0 is ``{name}_g{g}``. ``generation=None``
    resolves from stats.json (0 if absent)."""
    if generation is None:
        try:
            generation = int(read_stats(index_dir).get("generation", 0))
        except FileNotFoundError:
            generation = 0
    suffix = name if generation == 0 else f"{name}_g{generation}"
    return os.path.join(index_dir, suffix)


def write_stats(index_dir: str, stats: dict) -> None:
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, "stats.json.tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f, indent=2)
    os.replace(tmp, os.path.join(index_dir, "stats.json"))


def read_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "stats.json")) as f:
        return json.load(f)


def clear(index_dir: str) -> None:
    """Drop manifest + stats (used by --overwrite builds)."""
    import shutil

    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
