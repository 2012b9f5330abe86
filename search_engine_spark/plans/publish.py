"""Atomic table publish for mutations against a LIVE index.

Any rewrite of a table a concurrent searcher may be reading goes
through ``publish_dir``: write the new contents to a sibling temp
directory, then swap it into place with Linux
``renameat2(RENAME_EXCHANGE)`` — one syscall, so the live path is
never missing and never half-written. Platforms without the syscall
fall back to the old rmtree→rename pair (a brief missing-path window),
which is also the documented behavior on non-Linux dev machines.

Scope note: this makes each TABLE's publish atomic. A multi-table
mutation (compaction, merge-into) still has a documented cross-table
window in which different tables reflect different generations; the
per-table guarantee means a reader never crashes on a missing or
truncated directory, which is the failure that actually bites.
"""

from __future__ import annotations

import os
import shutil
import sys


def exchange_dirs(a: str, b: str) -> bool:
    """Atomically SWAP two paths via renameat2(RENAME_EXCHANGE)
    (Linux ≥3.15, same filesystem). Returns False when unavailable so
    callers can fall back."""
    import ctypes
    import ctypes.util

    if not sys.platform.startswith("linux"):
        return False
    libc_name = ctypes.util.find_library("c")
    if not libc_name:
        return False
    try:
        libc = ctypes.CDLL(libc_name, use_errno=True)
        AT_FDCWD = -100
        RENAME_EXCHANGE = 2
        rc = libc.renameat2(
            AT_FDCWD, os.fsencode(a), AT_FDCWD, os.fsencode(b),
            RENAME_EXCHANGE,
        )
        return rc == 0
    except (AttributeError, OSError):
        return False


def publish_dir(path: str, write_fn, *, suffix: str = ".publish") -> None:
    """Write a table rewrite to ``path + suffix`` via ``write_fn(tmp)``,
    then swap it into place atomically (fallback: rmtree + rename).
    A temp dir left by a crashed prior attempt is reclaimed first.
    If ``path`` does not exist yet (first install), the temp dir is
    simply renamed into place — also atomic."""
    tmp = path + suffix
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    write_fn(tmp)
    if not os.path.isdir(path):
        os.rename(tmp, path)
        return
    if exchange_dirs(tmp, path):
        shutil.rmtree(tmp)  # tmp now holds the OLD table
    else:
        shutil.rmtree(path)
        os.rename(tmp, path)
