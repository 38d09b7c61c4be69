"""Commit-claim storage strategies (Delta ``LogStore`` analogue).

The MergeStore commit protocol needs exactly FOUR storage
primitives; everything else (snapshot immutability, advance-only
pointer, claim expiry, log compaction) is plain object writes:

1. ``create_exclusive`` — create-if-absent of the claim manifest:
   THE serialization point (Delta's next-log-entry rule).
2. ``replace_file`` — atomic overwrite: claim breaking, manifest
   re-assert, pointer flips.
3. ``publish_snapshot`` — make a staged snapshot visible under its
   version name; the final arbiter when two claim-breakers race.
   False = lost, caller retries.
4. ``remove_snapshot`` — vacuum's reclaim of a version.

:class:`PosixLogStore` (the default) maps these to ``O_CREAT |
O_EXCL``, ``os.replace`` and ``os.rename`` — correct on local
disk, NFSv4 and HDFS. Object stores have no atomic rename; the
documented mapping (SCALE.md "Filesystem assumption of the commit
protocol") is Delta's: serialize on a conditional PUT
(``If-None-Match: *`` on S3, generation preconditions on GCS/ABFS,
or an S3DynamoDBLogStore-style coordination row) and make
"publish" a POINTER WRITE naming the already-uploaded immutable
file set, never a physical move.

:class:`PointerLogStore` proves the protocol holds under that
mapping: it never calls ``os.rename`` on a snapshot. Data files
are first linked to an immutable object area (uploads happen
before commit on a real object store), then the commit is one
conditional pointer create (``os.symlink`` — create-if-absent of
a name that references the file set, the conditional-PUT
analogue). Concurrency/crash tests parameterize over both
backends (tests/test_commit_protocol.py), so a future
``S3LogStore`` only has to implement these four methods.
"""

from __future__ import annotations

import os
import shutil
import uuid


#: dot-named staging files left by a writer that died between the
#: tmp write and its os.link are invisible to Delta listings AND to
#: vacuum (which skips hidden/underscore trees), so nothing ever
#: reclaims them. Age gate: anything older than this is provably not
#: a claim in flight (the write-then-link window is milliseconds).
_TMP_SWEEP_AGE_SEC = 300.0


def _sweep_stale_tmps(d: str, max_age: float = _TMP_SWEEP_AGE_SEC) -> None:
    """Best-effort reclaim of crashed writers' ``.{name}.{hex}.tmp``
    staging files in a log directory. Racing sweepers / a racing
    writer are safe: unlink of a tmp whose link already published
    only removes the extra name, and ENOENT losses are ignored."""
    import time

    try:
        cutoff = time.time() - max_age
        with os.scandir(d) as it:
            for ent in it:
                n = ent.name
                if not (n.startswith(".") and n.endswith(".tmp")):
                    continue
                try:
                    if ent.stat().st_mtime < cutoff:
                        os.unlink(ent.path)
                except OSError:
                    pass
    except OSError:
        pass


class LogStore:
    """Interface; see module docstring for the contract."""

    def create_exclusive(self, path: str, payload: str) -> bool:
        raise NotImplementedError

    def replace_file(self, path: str, payload: str, guard=None) -> None:
        """Atomic overwrite. ``guard`` (optional zero-arg callable)
        is evaluated IMMEDIATELY before the atomic swap, after any
        staging writes; a False return aborts without touching
        ``path``. This is the conditional-replace primitive the
        advance-only pointer needs: re-checking only before staging
        leaves the whole tmp-write open as a regression window on
        slow storage. Object-store backends can map it to a
        conditional PUT precondition instead."""
        raise NotImplementedError

    def publish_snapshot(self, staging: str, final: str) -> bool:
        raise NotImplementedError

    def remove_snapshot(self, final: str) -> None:
        raise NotImplementedError


class PosixLogStore(LogStore):
    """POSIX primitives: exclusive create, atomic replace, atomic
    dir rename (the commit point), rmtree."""

    def create_exclusive(self, path: str, payload: str) -> bool:
        # write-then-link, NOT open(O_EXCL)-then-write: the name is
        # the publication point (a claimed _delta_log entry is read
        # by concurrent stock clients the instant it exists), so it
        # must appear with its COMPLETE content — an exclusive open
        # followed by a write exposes an empty/truncated entry to a
        # racing reader. The tmp lives in the same directory (same
        # filesystem for link) under a dot-name every Delta listing
        # ignores; os.link fails atomically when the name exists,
        # preserving the create-if-absent claim semantics.
        d, base = os.path.split(path)
        _sweep_stale_tmps(d)
        tmp = os.path.join(d, f".{base}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError:
            return False
        except OSError:
            # two legitimate cases behind a generic OSError:
            # (1) the classic NFS ghost — the server applied the
            # link but the reply was lost and the retry reported
            # failure; st_nlink == 2 on the tmp proves our content
            # IS at the name, i.e. we won;
            # (2) the filesystem has no hard links (SMB/FAT/some
            # FUSE) — fall back to the exclusive-create claim,
            # which keeps create-if-absent semantics but loses
            # atomic-content publication (the best available there)
            try:
                if os.stat(tmp).st_nlink == 2:
                    return True
            except OSError:
                pass
            try:
                fd = os.open(
                    path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                )
            except FileExistsError:
                return False
            with os.fdopen(fd, "w") as fb:
                fb.write(payload)
            return True
        finally:
            os.remove(tmp)
        return True

    def replace_file(self, path: str, payload: str, guard=None) -> None:
        tmp = path + "." + uuid.uuid4().hex
        with open(tmp, "w") as f:
            f.write(payload)
        if guard is not None and not guard():
            os.remove(tmp)
            return
        os.replace(tmp, path)

    def publish_snapshot(self, staging: str, final: str) -> bool:
        try:
            os.rename(staging, final)
            return True
        except OSError:
            return False

    def remove_snapshot(self, final: str) -> None:
        shutil.rmtree(final, ignore_errors=True)


class PointerLogStore(LogStore):
    """Object-store-shaped test double: NO snapshot rename, ever.

    ``publish_snapshot`` = upload-then-conditional-pointer-write:
    the staged tree is hardlinked to an immutable object area
    (``_OBJECTS/<uuid>``, standing in for the data files already
    living at their final object keys), then a symlink is created
    AT the version name referencing it — ``os.symlink`` fails on an
    existing name, giving exactly the create-if-absent semantics of
    S3 ``If-None-Match: *`` / GCS ``ifGenerationMatch=0``. Losers
    get False and their uploaded objects are reclaimed. Claim files
    and pointer flips are plain object writes (PUT is atomic
    overwrite on every object store), so they reuse the POSIX
    small-file primitives."""

    _posix = PosixLogStore()

    def create_exclusive(self, path: str, payload: str) -> bool:
        return self._posix.create_exclusive(path, payload)

    def replace_file(self, path: str, payload: str, guard=None) -> None:
        self._posix.replace_file(path, payload, guard)

    def publish_snapshot(self, staging: str, final: str) -> bool:
        objects_root = os.path.join(
            os.path.dirname(final), "_OBJECTS"
        )
        os.makedirs(objects_root, exist_ok=True)
        obj_dir = os.path.join(objects_root, uuid.uuid4().hex)
        # "upload": link the immutable file set to its object keys
        for root, _dirs, files in os.walk(staging):
            rel = os.path.relpath(root, staging)
            dst_root = (
                os.path.join(obj_dir, rel) if rel != "." else obj_dir
            )
            os.makedirs(dst_root, exist_ok=True)
            for fname in files:
                os.link(
                    os.path.join(root, fname),
                    os.path.join(dst_root, fname),
                )
        try:
            os.symlink(obj_dir, final)  # the conditional pointer PUT
        except (FileExistsError, OSError):
            shutil.rmtree(obj_dir, ignore_errors=True)
            return False
        # the caller owns (and may reuse/drop) the staging dir, same
        # contract as the rename backend after a LOST publish; after
        # a WON one the rename backend consumed staging — match that
        shutil.rmtree(staging, ignore_errors=True)
        return True

    def remove_snapshot(self, final: str) -> None:
        if os.path.islink(final):
            target = os.path.realpath(final)
            os.unlink(final)  # drop the pointer first (readers miss)
            shutil.rmtree(target, ignore_errors=True)
        else:
            shutil.rmtree(final, ignore_errors=True)
