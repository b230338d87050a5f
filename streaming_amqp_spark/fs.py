"""Marker/metadata IO for the persisted index stores — the single seam
between "this container's local filesystem" and "the cluster's object
store / DFS".

Every byte of index DATA moves through Spark's own parquet reader and
writer, which already speak any Hadoop-compatible filesystem.  What
does NOT go through Spark are the small control files the stores keep
next to the parquet — `_DONE` build markers, `_SCHEMA` sidecars,
`_batches/<epoch>` idempotence markers, `_COMPACT` flags.  On this
single-node container they are plain `open()`/`os.path` operations; on
a real cluster they must live on the SAME store as the parquet (S3 /
HDFS / ABFS) and go through its client.  Centralizing them here means
the port is this one file — swap the implementations for
`fsspec`/Hadoop-FS calls and nothing above this layer changes.

Cluster caveats the swap must honor (documented here because the local
implementation makes them invisible):

- `write_text` must be atomic-enough for a SINGLE writer: the stores'
  concurrency contract is one writer per index path
  (`operators/index_store.py` module docstring), so plain
  write-then-close suffices; a multi-writer deployment needs a
  lease/lock object the contract explicitly does not provide.
- `exists`/`read_text` on S3 are read-after-write consistent for new
  keys (post-2020 S3); the marker protocol only ever creates and
  deletes whole keys, never appends to them.
"""

from __future__ import annotations

import os


def exists(path: str) -> bool:
    return os.path.exists(path)


def read_text(path: str) -> str:
    with open(path, "r") as fh:
        return fh.read()


def write_text(path: str, content: str) -> None:
    with open(path, "w") as fh:
        fh.write(content)


def remove(path: str) -> None:
    if os.path.exists(path):
        os.unlink(path)


def makedirs(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def listdir(path: str) -> list[str]:
    return sorted(os.listdir(path)) if os.path.isdir(path) else []


_TAIL_BYTES = 65536


def stat_fingerprint(data_path: str) -> str:
    """A cheap content fingerprint of a source dataset: the sorted
    (relative name, size, mtime_ns, tail-hash) tuples of every file
    under ``data_path`` (or of the single file itself), hashed.
    Regenerating a corpus in place — the degenerate-sweep corpora on a
    synth-version bump, a re-synthesized bench sf1 — changes the
    fingerprint, which is exactly the signal the index stores fold
    into their `_DONE` markers so a rebuilt corpus forces an index
    rebuild instead of silently serving stale rows (ADVICE r13).

    The tail-hash term covers the stat-only blind spot (ADVICE r14): a
    corpus restored with identical sizes AND preserved mtimes (cp -p
    of different content, coarse-mtime filesystems) slips past
    (name, size, mtime) alone.  The last 64 KiB of a parquet file is
    its footer — row-group metadata, column statistics, offsets — so
    any content change moves it; reading it costs one ranged read per
    file, and these corpora are single-digit file counts.  On an
    object store this maps to listing keys with ETags (a true content
    hash, subsuming the tail read) or a ranged GET of the footer —
    one round trip per file either way."""
    import hashlib

    def entry(p: str, rel: str) -> str:
        st = os.stat(p)
        with open(p, "rb") as fh:
            fh.seek(max(0, st.st_size - _TAIL_BYTES))
            tail = hashlib.md5(fh.read(_TAIL_BYTES)).hexdigest()[:16]
        return f"{rel}:{st.st_size}:{st.st_mtime_ns}:{tail}"

    parts: list[str] = []
    if os.path.isdir(data_path):
        for root, _dirs, files in os.walk(data_path):
            for f in sorted(files):
                p = os.path.join(root, f)
                parts.append(entry(p, os.path.relpath(p, data_path)))
    elif os.path.exists(data_path):
        parts.append(entry(data_path, "."))
    return hashlib.md5("|".join(sorted(parts)).encode()).hexdigest()[:16]
