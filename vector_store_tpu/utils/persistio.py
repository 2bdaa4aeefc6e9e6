"""Atomic npz writes for index snapshots.

A snapshot interrupted mid-write (process kill, ENOSPC) must not leave a
truncated ``.npz`` at the target path: the next restore sees the file
exists, `np.load` raises `BadZipFile`, and the checkpoint is worse than
absent.  Both helpers write to a sibling temp path and `os.replace`
into place, so the target is always either the old snapshot or the new
one.  (The reference has no persistence at all — SURVEY §5 — so this is
a property of our extension, not a parity behaviour.)
"""

from __future__ import annotations

import os

import numpy as np


def _effective_target(path: str) -> str:
    # np.savez appends ".npz" when the name lacks it; mirror that so the
    # rename lands where the caller's np.load will look.
    return path if path.endswith(".npz") else path + ".npz"


def _atomic(savefn, path: str, **arrays) -> None:
    target = _effective_target(str(path))
    tmp = target[: -len(".npz")] + f".tmp{os.getpid()}.npz"
    try:
        savefn(tmp, **arrays)
        os.replace(tmp, target)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def atomic_savez(path: str, **arrays) -> None:
    """`np.savez` with write-to-temp + rename-into-place semantics."""
    _atomic(np.savez, path, **arrays)


def atomic_savez_compressed(path: str, **arrays) -> None:
    """`np.savez_compressed`, atomic the same way."""
    _atomic(np.savez_compressed, path, **arrays)
