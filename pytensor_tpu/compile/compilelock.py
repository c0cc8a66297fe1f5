"""Compile-directory locking (reference compile/compilelock.py).

The real locking lives in link/c/build.py (fcntl flock around the
hashed kernel cache); this module re-exports the reference-named API.
"""

from __future__ import annotations

from pytensor_tpu.link.c.build import lock_ctx  # noqa: F401


def force_unlock(lock_dir=None):
    """Remove a stale lock nobody holds (zero-timeout acquire probe)."""
    import glob
    import os

    pats = ([os.path.join(lock_dir, ".lock")] if lock_dir
            else glob.glob(os.path.expanduser(
                "~/.pytensor_tpu_cache/**/.lock"), recursive=True))
    for path in pats:
        try:
            import fcntl

            fd = os.open(path, os.O_RDWR)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                fcntl.flock(fd, fcntl.LOCK_UN)
                os.close(fd)
                os.remove(path)
            except OSError:
                os.close(fd)  # held by a live process — leave it
        except OSError:
            continue
