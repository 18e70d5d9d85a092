"""Commit-protocol substrate for the version chain (VERDICT r09 item 9,
extended r11 with the lease/takeover story and the public blob API).

The chain DML's optimistic concurrency needs exactly three primitives:

1. CLAIM a version number atomically (local FS: ``os.makedirs`` with no
   exist_ok — the O_EXCL mutex; object store: conditional PUT of a claim
   object — S3 ``If-None-Match: *`` / GCS ``ifGenerationMatch=0``);
2. PUBLISH a built version (local FS: write the ``_commit`` marker file;
   object store: conditional PUT of the marker object — readers only ever
   see versions whose marker exists, and the FIRST marker wins);
3. LINK an immutable data file into a new version (local FS: hardlink;
   object store: a MANIFEST ENTRY — a pointer PUT, never a byte copy).

This module holds the substrate-agnostic half: the ``advance()`` claim →
build → publish loop every chain-advancing DML runs (rebase-and-retry on
collision, claim release on build failure, capped-exponential backoff while
a competitor builds, optional LEASE TAKEOVER of an expired claim), the
``KVCommitStoreBase`` key-value protocol logic shared by every
conditional-PUT substrate, and ``MemoryKVCommitStore`` — an in-memory
conditional-PUT store that models the object-store port so the protocol's
concurrency semantics are testable without a cloud dependency.
``kv_http.HttpKVCommitStore`` is the same protocol over live HTTP
(If-None-Match conditional PUTs against a real server);
``sinks.LocalFSCommitStore`` is the production local-FS implementation;
``sinks._advance_table`` routes through ``advance()`` so the SAME protocol
code runs against every substrate (tests/test_commit_store.py and
tests/test_kv_table.py drive them side by side).

Lease/takeover (closes VERDICT r10 item 7). Claims carry a wall-clock
timestamp and live in GENERATIONS: ``v{n}/_claim`` is generation 0,
``v{n}/_claim.g{G}`` the successors. A writer that finds the LATEST
generation older than ``lease_ttl`` seconds may conditional-PUT the next
generation — the PUT's put-if-absent atomicity elects exactly one taker.
Double-commit is impossible by construction even if the original writer
revives: each generation stages its manifest entries under its OWN
namespace (``v{n}/files/`` for gen 0, ``v{n}/g{G}/files/`` after), and the
version's ONE ``_commit`` marker is itself a conditional PUT recording the
winning generation — the loser's publish returns False and its staged
pointers are invisible garbage for ``vacuum_blobs``, never a torn table.
Local FS mkdir has no lease (no takeover there; the error message says so).
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
    lease_ttl: "float | None" = None,
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
    wedged by a handled error.

    ``lease_ttl`` (seconds) enables TAKEOVER on stores that support it: a
    competitor's claim whose latest generation is older than the TTL is
    presumed crashed and this writer claims the successor generation.  If
    the presumed-dead writer revives and publishes first, this writer's
    conditional marker PUT returns False — its (equally valid) build is
    abandoned and the loop rebases, so at most ONE commit per version ever
    exists. Stores without ``try_takeover`` (local FS) ignore the TTL."""
    last_seen = None
    for attempt in range(1, retries + 2):
        base = store.latest_committed()
        ver = base + 1
        owned = store.try_claim(ver)
        if not owned and lease_ttl is not None:
            takeover = getattr(store, "try_takeover", None)
            owned = takeover is not None and takeover(ver, lease_ttl) is not None
        if not owned:
            if base == last_seen:
                time.sleep(min(2.0, 0.05 * (2 ** attempt)))
            last_seen = base
            continue
        try:
            stats = build(base, ver)
        except BaseException:
            store.release_claim(ver)
            raise
        ok = store.publish(
            ver, {"op": op, "stats": _json_safe(stats), **(extra_info or {})}
        )
        if ok is False:
            # lost the MARKER race: a taken-over writer revived and
            # committed this version first. Both builds were valid against
            # the same base — this one's staged pointers are invisible
            # garbage (vacuum collects them); rebase onto the winner.
            last_seen = None
            continue
        return {**stats, "version": ver, "attempts": attempt}
    raise VersionConflict(
        f"could not claim a version in {store!r} after {retries + 1} "
        f"attempts (v{store.latest_committed() + 1} stays claimed but "
        "uncommitted — a crashed writer's claim needs manual removal, or a "
        "lease takeover: pass lease_ttl on a store that supports one)"
    )


class KVCommitStoreBase:
    """The commit protocol over ANY conditional-PUT key-value substrate.

    Subclasses provide five object primitives — ``_put_if_absent(key,
    val)`` (the ONE concurrency primitive: S3 ``If-None-Match: *`` / GCS
    ``ifGenerationMatch=0``), ``_put(key, val)``, ``_get(key)``,
    ``_delete(key)``, ``_list(prefix)`` (→ {key: size}) — and inherit the
    whole protocol: generational claims with lease timestamps, conditional
    marker publish, per-generation manifest namespaces, the public blob
    API, and the read side.

    Key layout: claims are ``v{n}/_claim`` (gen 0) / ``v{n}/_claim.g{G}``
    (takeover generations), markers ``v{n}/_commit`` (body records the
    winning generation), manifest entries ``v{n}/files/{name}`` for gen 0
    and ``v{n}/g{G}/files/{name}`` after, blobs ``blobs/{blob_id}``.
    Linking a file into a new version is a pointer PUT, never a copy; two
    versions sharing a blob is the object-store analogue of hardlink inode
    sharing (``blob_refs`` / ``vacuum_blobs`` reference-count it).

    Which generation this CLIENT owns for a version is writer-local state
    (kept per-thread so a shared client instance in the race fuzzer stays
    correct); everything consistency-critical lives in the store."""

    def __init__(self) -> None:
        self._owned = threading.local()

    # -- five object primitives (subclass responsibility) -----------------
    def _put_if_absent(self, key: str, val: bytes) -> bool:
        raise NotImplementedError

    def _put(self, key: str, val: bytes) -> None:
        raise NotImplementedError

    def _get(self, key: str) -> "bytes | None":
        raise NotImplementedError

    def _delete(self, key: str) -> None:
        raise NotImplementedError

    def _list(self, prefix: str) -> "dict[str, int]":
        raise NotImplementedError

    # -- generation bookkeeping (client-side, per thread) ------------------
    def _gens(self) -> dict:
        d = getattr(self._owned, "gens", None)
        if d is None:
            d = self._owned.gens = {}
        return d

    @staticmethod
    def _claim_key(ver: int, gen: int) -> str:
        return f"v{ver}/_claim" if gen == 0 else f"v{ver}/_claim.g{gen}"

    @staticmethod
    def _files_prefix(ver: int, gen: int) -> str:
        return f"v{ver}/files/" if gen == 0 else f"v{ver}/g{gen}/files/"

    def _claim_generations(self, ver: int) -> "dict[int, float]":
        """Existing claim generations of ``ver`` → their lease timestamps."""
        out = {}
        for key in self._list(f"v{ver}/_claim"):
            tail = key.rsplit("/_claim", 1)[1]
            gen = int(tail[2:]) if tail.startswith(".g") else 0
            body = self._get(key)
            ts = 0.0
            if body:
                try:
                    ts = float(json.loads(body).get("ts", 0.0))
                except (ValueError, TypeError):
                    pass
            out[gen] = ts
        return out

    def _owned_gen(self, ver: int) -> int:
        """The generation THIS writer owns for ``ver`` — or, for a version
        it never claimed (direct link to an existing version), the
        committed marker's winning generation, else 0."""
        gen = self._gens().get(ver)
        if gen is not None:
            return gen
        marker = self.read_marker(ver)
        return int((marker or {}).get("gen", 0))

    # -- the protocol primitives ------------------------------------------
    def try_claim(self, ver: int) -> bool:
        ok = self._put_if_absent(
            self._claim_key(ver, 0), json.dumps({"ts": time.time()}).encode()
        )
        if ok:
            self._gens()[ver] = 0
        return ok

    def try_takeover(self, ver: int, ttl: float) -> "int | None":
        """Claim the successor GENERATION of an expired claim. Returns the
        owned generation, or None (claim still fresh / lost the PUT race /
        nothing to take over). The conditional PUT elects exactly one
        taker; the revived original can still publish FIRST but never
        AS WELL (the marker is itself a conditional PUT)."""
        gens = self._claim_generations(ver)
        if not gens:
            return None
        latest = max(gens)
        if time.time() - gens[latest] < ttl:
            return None
        nxt = latest + 1
        ok = self._put_if_absent(
            self._claim_key(ver, nxt), json.dumps({"ts": time.time()}).encode()
        )
        if not ok:
            return None
        self._gens()[ver] = nxt
        return nxt

    def release_claim(self, ver: int) -> None:
        """Release THIS writer's claim generation and its staged pointers.
        Scoped to the owned generation so a zombie's release after a
        takeover cannot delete the taker's work."""
        gen = self._gens().pop(ver, 0)
        for key in list(self._list(self._files_prefix(ver, gen))):
            self._delete(key)
        self._delete(self._claim_key(ver, gen))

    def publish(self, ver: int, info: "dict | None") -> bool:
        """Conditional PUT of the commit marker — the linearization point.
        Returns False when another writer's marker already exists (a
        taken-over zombie lost the race; ``advance`` rebases). ``info=None``
        against an existing marker is the idempotent re-publish no-op."""
        key = f"v{ver}/_commit"
        body = json.dumps(
            {"gen": self._gens().get(ver, 0), **(info or {})}
        ).encode()
        if self._put_if_absent(key, body):
            self._gens().pop(ver, None)
            return True
        return info is None  # re-publish no-op succeeds, a lost race fails

    # -- read side ----------------------------------------------------------
    def committed(self) -> "list[int]":
        return sorted(
            int(k.split("/", 1)[0][1:])
            for k in self._list("v")
            if k.endswith("/_commit")
        )

    def claimed(self) -> "list[int]":
        """Claimed-but-uncommitted versions — in-flight writers whose
        staged blobs must be GC ROOTS for ``vacuum_blobs`` (collecting a
        live writer's fresh uploads would corrupt its publish)."""
        done = set(self.committed())
        return sorted(
            {
                int(k.split("/", 1)[0][1:])
                for k in self._list("v")
                if "/_claim" in k
            }
            - done
        )

    def latest_committed(self) -> int:
        vs = self.committed()
        if not vs:
            raise ValueError("no committed version in store")
        return vs[-1]

    def read_marker(self, ver: int) -> "dict | None":
        body = self._get(f"v{ver}/_commit")
        return json.loads(body) if body else None

    # -- data-file manifest entries ("link" as a pointer PUT) --------------
    def link(self, ver: int, name: str, blob_id: str) -> None:
        self._put(
            self._files_prefix(ver, self._owned_gen(ver)) + name,
            blob_id.encode(),
        )

    def list_files(self, ver: int) -> "dict[str, str]":
        """The version's manifest — the WINNING generation's entries for a
        committed version, this writer's own staging for an in-flight one."""
        pre = self._files_prefix(ver, self._owned_gen(ver))
        return {
            k[len(pre):]: (self._get(k) or b"").decode()
            for k in self._list(pre)
        }

    def list_files_all_generations(self, ver: int) -> "dict[str, str]":
        """Union of EVERY generation's staged entries — the over-approximate
        manifest ``vacuum_blobs`` roots an in-flight version with (extra
        roots delay GC; missing roots would corrupt a live writer)."""
        out = {}
        for key in self._list(f"v{ver}/"):
            if "/files/" in key:
                out[key.split("/files/", 1)[1]] = (self._get(key) or b"").decode()
        return out

    # -- blob API (public: vacuum/table_totals/readers use ONLY this) ------
    def put_blob(self, blob_id: str, data: bytes) -> None:
        self._put(f"blobs/{blob_id}", data)

    def read_blob(self, blob_id: str) -> bytes:
        body = self._get(f"blobs/{blob_id}")
        if body is None:
            raise KeyError(blob_id)
        return body

    def put_blob_from(self, blob_id: str, local_path: str) -> None:
        """Upload from a file. The memory model buffers (documented model
        limit); the HTTP store overrides with a true streaming PUT."""
        with open(local_path, "rb") as fh:
            self.put_blob(blob_id, fh.read())

    def read_blob_to(self, blob_id: str, local_path: str) -> None:
        """Download to a file (atomic: temp + rename). The HTTP store
        overrides with a chunked streaming GET."""
        import os

        tmp = local_path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(self.read_blob(blob_id))
        os.replace(tmp, local_path)

    def list_blobs(self) -> "dict[str, int]":
        return {
            k.split("/", 1)[1]: size for k, size in self._list("blobs/").items()
        }

    def delete_blob(self, blob_id: str) -> None:
        self._delete(f"blobs/{blob_id}")

    def blob_url(self, blob_id: str) -> "str | None":
        """Direct-GET URL for executor-side fetch; None when blobs are only
        reachable through this client process (the in-memory model)."""
        return None

    def blob_refs(self, blob_id: str) -> int:
        want = blob_id
        n = 0
        for key in self._list("v"):
            if "/files/" in key and (self._get(key) or b"").decode() == want:
                n += 1
        return n


class MemoryKVCommitStore(KVCommitStoreBase):
    """Conditional-PUT key-value model of the object-store substrate.

    Objects are (key → bytes) with ONE concurrency primitive:
    put-if-absent — exactly what S3 ``If-None-Match: *`` / GCS
    ``ifGenerationMatch=0`` give. All protocol logic lives in
    ``KVCommitStoreBase``; this class is the five object primitives over a
    locked dict. ``kv_http.HttpKVCommitStore`` is the same five primitives
    over live HTTP — tests/test_kv_table.py drives both."""

    def __init__(self) -> None:
        super().__init__()
        self._objs: "dict[str, bytes]" = {}
        self._lock = threading.Lock()

    def __repr__(self) -> str:  # shows up in VersionConflict messages
        return f"MemoryKVCommitStore({len(self.committed())} committed)"

    def _put_if_absent(self, key: str, val: bytes) -> bool:
        with self._lock:
            if key in self._objs:
                return False
            self._objs[key] = val
            return True

    def _put(self, key: str, val: bytes) -> None:
        with self._lock:
            self._objs[key] = val

    def _get(self, key: str) -> "bytes | None":
        with self._lock:
            return self._objs.get(key)

    def _delete(self, key: str) -> None:
        with self._lock:
            self._objs.pop(key, None)

    def _list(self, prefix: str) -> "dict[str, int]":
        with self._lock:
            return {
                k: len(v) for k, v in self._objs.items() if k.startswith(prefix)
            }
