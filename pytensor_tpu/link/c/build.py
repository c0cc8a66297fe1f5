"""Build/cache machinery for the native host VM.

Parallels the reference's cmodule/compilelock pair (link/c/cmodule.py
ModuleCache + compile/compilelock.py): compile once into a per-user,
per-python-version cache directory guarded by a file lock; load with
dlopen via importlib.  Falls back to the pure-python loop if no compiler
is available.
"""

from __future__ import annotations

import contextlib
import hashlib
import importlib.util
import os
import subprocess
import sys
import sysconfig
from pathlib import Path

_hostvm_module = None
_build_failed = False


def cache_dir() -> Path:
    base = os.environ.get("PYTENSOR_TPU_CACHE",
                          os.path.join(os.path.expanduser("~"), ".pytensor_tpu"))
    tag = f"py{sys.version_info.major}{sys.version_info.minor}"
    p = Path(base) / f"hostvm_{tag}"
    p.mkdir(parents=True, exist_ok=True)
    return p


@contextlib.contextmanager
def lock_ctx(path: Path):
    """fcntl file lock around the build dir (compilelock parity)."""
    import fcntl

    lock_file = path / ".lock"
    with open(lock_file, "w") as fh:
        fcntl.flock(fh, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(fh, fcntl.LOCK_UN)


def _source_path() -> Path:
    return Path(__file__).parent / "hostvm.c"


def _build_module(src: Path, modname: str) -> Path | None:
    code = src.read_bytes()
    key = hashlib.sha256(code).hexdigest()[:16]
    d = cache_dir()
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = d / f"{modname}_{key}{suffix}"
    if out.exists():
        return out
    with lock_ctx(d):
        if out.exists():
            return out
        cc = os.environ.get("CC", "gcc")
        include = sysconfig.get_paths()["include"]
        cmd = [
            cc, "-O2", "-fPIC", "-shared", f"-I{include}",
            str(src), "-o", str(out) + ".tmp",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            return None
        os.replace(str(out) + ".tmp", out)
    return out


_native_modules: dict = {}


def get_native_module(name: str):
    """Compile-and-load a C extension from link/c/<name>.c (cached);
    returns the module or None (callers keep a python fallback)."""
    if name in _native_modules:
        return _native_modules[name]
    modname = f"_pytensor_tpu_{name}"
    mod = None
    try:
        path = _build_module(Path(__file__).parent / f"{name}.c", modname)
        if path is not None:
            spec = importlib.util.spec_from_file_location(modname, path)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
    except Exception:
        mod = None
    _native_modules[name] = mod
    return mod


def get_hostvm():
    """Return the compiled hostvm module, or None (python fallback)."""
    global _hostvm_module, _build_failed
    if _hostvm_module is not None:
        return _hostvm_module
    if _build_failed:
        return None
    try:
        path = _build_module(_source_path(), "_pytensor_tpu_hostvm")
    except Exception:
        path = None
    if path is None:
        _build_failed = True
        return None
    spec = importlib.util.spec_from_file_location("_pytensor_tpu_hostvm", path)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception:
        _build_failed = True
        return None
    _hostvm_module = mod
    return mod
