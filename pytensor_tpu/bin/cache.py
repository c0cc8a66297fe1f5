"""pytensor-tpu-cache: inspect/clear the on-disk caches.

Parallels the reference's only CLI, ``pytensor-cache``
(bin/pytensor_cache.py): manages the hostvm build cache and the jax
persistent compilation cache directory.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
from pathlib import Path


def _dirs():
    from pytensor_tpu.link.c.build import cache_dir

    host = cache_dir().parent
    jax_cache = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    return host, Path(jax_cache) if jax_cache else None


def list_cache():
    host, jaxc = _dirs()
    for name, d in (("hostvm", host), ("jax-compilation", jaxc)):
        if d is None:
            print(f"{name}: (not configured)")
            continue
        if not d.exists():
            print(f"{name}: {d} (empty)")
            continue
        total = sum(f.stat().st_size for f in d.rglob("*") if f.is_file())
        n = sum(1 for f in d.rglob("*") if f.is_file())
        print(f"{name}: {d} — {n} files, {total / 1e6:.1f} MB")


def clear_cache():
    host, jaxc = _dirs()
    for d in (host, jaxc):
        if d is not None and d.exists():
            shutil.rmtree(d)
            print(f"cleared {d}")


def unlock():
    host, _ = _dirs()
    for lock in host.rglob(".lock"):
        lock.unlink()
        print(f"removed {lock}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="pytensor-tpu-cache")
    p.add_argument("action", choices=["list", "clear", "unlock"], nargs="?",
                   default="list")
    args = p.parse_args(argv)
    {"list": list_cache, "clear": clear_cache, "unlock": unlock}[args.action]()


if __name__ == "__main__":
    main()
