"""Commit-protocol substrate for the version chain (VERDICT r09 item 9).

The chain DML's optimistic concurrency needs exactly three primitives:

1. CLAIM a version number atomically (local FS: ``os.makedirs`` with no
   exist_ok — the O_EXCL mutex; object store: conditional PUT of a claim
   object — S3 ``If-None-Match: *`` / GCS ``ifGenerationMatch=0``);
2. PUBLISH a built version (local FS: write the ``_commit`` marker file;
   object store: PUT the marker object — readers only ever see versions
   whose marker exists);
3. LINK an immutable data file into a new version (local FS: hardlink;
   object store: a MANIFEST ENTRY — a pointer PUT, never a byte copy).

This module holds the substrate-agnostic half: the ``CommitStore``
interface, the shared ``advance()`` claim → build → publish loop every
chain-advancing DML runs (rebase-and-retry on collision, claim release on
build failure, capped-exponential backoff while a competitor builds), and
``MemoryKVCommitStore`` — an in-memory conditional-PUT key-value store that
models the object-store port so the protocol's concurrency semantics are
testable without a cloud dependency. ``sinks.LocalFSCommitStore`` is the
production local-FS implementation; ``sinks._advance_table`` routes through
``advance()`` so the SAME protocol code runs against both substrates
(tests/test_commit_store.py drives them side by side).

What the object-store port changes and what it does not: claims get a real
TTL story (a conditional-PUT claim can carry a lease and be reclaimed;
a crashed local-FS mkdir cannot), links become manifest entries resolved at
read time (vacuum then reference-counts manifests instead of inodes), and
nothing else — versions, markers, rebase, and the read-side "committed
marker or invisible" rule are substrate-independent.
"""

from __future__ import annotations

import json
import threading
import time


class VersionConflict(RuntimeError):
    """Two writers raced for the same table version and retries ran out."""


def _json_safe(stats: dict) -> dict:
    out = {}
    for k, v in stats.items():
        try:
            json.dumps(v)
        except TypeError:
            continue
        out[k] = v
    return out


def advance(
    store,
    build,
    retries: int = 3,
    op: str = "write",
    extra_info: "dict | None" = None,
) -> dict:
    """The claim → build → publish loop every chain-advancing DML shares,
    against any ``CommitStore``: read the latest committed version, claim
    the next number (conditional create), run ``build(base_version,
    new_version)``, publish the marker recording ``op`` + the build's
    stats (+ ``extra_info``, e.g. a streaming writer's txn tag).

    A lost claim race rebases onto the advanced chain and retries; a
    claimed-but-uncommitted competitor gets capped-exponential backoff (its
    build is a real job taking seconds) and ``VersionConflict`` after
    ``retries``; a FAILED build releases its claim so the chain is never
    wedged by a handled error."""
    last_seen = None
    for attempt in range(1, retries + 2):
        base = store.latest_committed()
        ver = base + 1
        if not store.try_claim(ver):
            if base == last_seen:
                time.sleep(min(2.0, 0.05 * (2 ** attempt)))
            last_seen = base
            continue
        try:
            stats = build(base, ver)
        except BaseException:
            store.release_claim(ver)
            raise
        store.publish(
            ver, {"op": op, "stats": _json_safe(stats), **(extra_info or {})}
        )
        return {**stats, "version": ver, "attempts": attempt}
    raise VersionConflict(
        f"could not claim a version in {store!r} after {retries + 1} "
        f"attempts (v{store.latest_committed() + 1} stays claimed but "
        "uncommitted — a crashed writer's claim needs manual removal, or a "
        "lease takeover on a store that supports one)"
    )


class MemoryKVCommitStore:
    """Conditional-PUT key-value model of the object-store substrate.

    Objects are (key → bytes) with ONE concurrency primitive:
    put-if-absent — exactly what S3 ``If-None-Match: *`` / GCS
    ``ifGenerationMatch=0`` give. Claims are ``v{n}/_claim`` objects,
    markers are ``v{n}/_commit``, and data "files" are manifest-entry
    pointers ``v{n}/files/{name}`` whose value names an immutable blob —
    linking a file into a new version is a pointer PUT, never a copy, and
    two versions sharing a blob is the object-store analogue of hardlink
    inode sharing (``blob_refs`` is what vacuum would reference-count)."""

    def __init__(self) -> None:
        self._objs: "dict[str, bytes]" = {}
        self._lock = threading.Lock()

    def __repr__(self) -> str:  # shows up in VersionConflict messages
        return f"MemoryKVCommitStore({len(self.committed())} committed)"

    # -- the one real concurrency primitive ------------------------------
    def _put_if_absent(self, key: str, val: bytes) -> bool:
        with self._lock:
            if key in self._objs:
                return False
            self._objs[key] = val
            return True

    # -- the three protocol primitives -----------------------------------
    def try_claim(self, ver: int) -> bool:
        return self._put_if_absent(f"v{ver}/_claim", b"")

    def release_claim(self, ver: int) -> None:
        with self._lock:
            for k in [k for k in self._objs if k.startswith(f"v{ver}/")]:
                del self._objs[k]

    def publish(self, ver: int, info: "dict | None") -> None:
        # a PUT to an existing marker with info=None must not blank it
        # (mark_committed's idempotent re-publish contract)
        key = f"v{ver}/_commit"
        with self._lock:
            if info is None and self._objs.get(key):
                return
            self._objs[key] = json.dumps(info or {}).encode()

    # -- read side --------------------------------------------------------
    def committed(self) -> "list[int]":
        return sorted(
            int(k.split("/", 1)[0][1:])
            for k in self._objs
            if k.endswith("/_commit")
        )

    def latest_committed(self) -> int:
        vs = self.committed()
        if not vs:
            raise ValueError("no committed version in store")
        return vs[-1]

    def read_marker(self, ver: int) -> "dict | None":
        body = self._objs.get(f"v{ver}/_commit")
        return json.loads(body) if body else None

    # -- data-file manifest entries ("link" as a pointer PUT) -------------
    def put_blob(self, blob_id: str, data: bytes) -> None:
        self._objs[f"blobs/{blob_id}"] = data

    def link(self, ver: int, name: str, blob_id: str) -> None:
        self._objs[f"v{ver}/files/{name}"] = blob_id.encode()

    def list_files(self, ver: int) -> "dict[str, str]":
        pre = f"v{ver}/files/"
        return {
            k[len(pre):]: v.decode()
            for k, v in self._objs.items()
            if k.startswith(pre)
        }

    def read_blob(self, blob_id: str) -> bytes:
        return self._objs[f"blobs/{blob_id}"]

    def blob_refs(self, blob_id: str) -> int:
        want = blob_id.encode()
        return sum(
            1 for k, v in self._objs.items()
            if "/files/" in k and v == want
        )
