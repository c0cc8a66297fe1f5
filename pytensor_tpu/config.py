"""Typed configuration flags.

TPU-native analog of the reference config system
(/root/reference/pytensor/configparser.py:65 ``PyTensorConfigParser`` and
configdefaults.py): typed params, priority ``PYTENSOR_TPU_FLAGS`` env >
``~/.pytensor_tpu_rc`` > defaults, and a ``change_flags``
context-manager/decorator.  Flags target devices/precision/donation instead
of cxx/blas, per SURVEY.md §5.6.
"""

from __future__ import annotations

import configparser as _cp
import contextlib
import os
from functools import wraps
from pathlib import Path
from typing import Any, Callable


class ConfigParam:
    def __init__(self, default, apply=None, validate=None, mutable=True, doc=""):
        self.default = default
        self.apply = apply or (lambda x: x)
        self.validate = validate or (lambda x: True)
        self.mutable = mutable
        self.doc = doc
        self.name = "<unset>"


class BoolParam(ConfigParam):
    def __init__(self, default, **kw):
        def _apply(v):
            if isinstance(v, str):
                if v.lower() in ("true", "1", "yes"):
                    return True
                if v.lower() in ("false", "0", "no"):
                    return False
                raise ValueError(f"Invalid bool for {self.name}: {v}")
            return bool(v)

        super().__init__(default, apply=_apply, **kw)


class IntParam(ConfigParam):
    def __init__(self, default, **kw):
        super().__init__(default, apply=int, **kw)


class FloatParam(ConfigParam):
    def __init__(self, default, **kw):
        super().__init__(default, apply=float, **kw)


class StrParam(ConfigParam):
    def __init__(self, default, **kw):
        super().__init__(default, apply=str, **kw)


class EnumStr(ConfigParam):
    def __init__(self, default, options, **kw):
        self.options = (default, *options)

        def _validate(v):
            if v not in self.options:
                raise ValueError(
                    f"Invalid value {v!r} for flag {self.name}; choices: {self.options}"
                )
            return True

        super().__init__(default, validate=_validate, **kw)


def _read_env_flags() -> dict[str, str]:
    flags = {}
    raw = os.environ.get("PYTENSOR_TPU_FLAGS", "")
    for part in raw.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(f"Invalid PYTENSOR_TPU_FLAGS fragment: {part!r}")
        k, v = part.split("=", 1)
        flags[k.strip()] = v.strip()
    return flags


def _read_rc_files() -> dict[str, str]:
    flags: dict[str, str] = {}
    paths = os.environ.get("PYTENSOR_TPU_RC")
    if paths is None:
        candidates = [Path.home() / ".pytensor_tpu_rc"]
    else:
        candidates = [Path(p) for p in paths.split(os.pathsep) if p]
    parser = _cp.ConfigParser()
    for p in candidates:
        if p.exists():
            parser.read(p)
    for section in parser.sections():
        for k, v in parser.items(section):
            key = k if section in ("global", "DEFAULT") else f"{section}__{k}"
            flags[key] = v
    return flags


class _ChangeFlagsDecorator:
    def __init__(self, cfg, **kwargs):
        self.cfg = cfg
        self.kwargs = kwargs

    def __call__(self, fn):
        @wraps(fn)
        def wrapped(*a, **kw):
            with self.cfg._change_flags_ctx(**self.kwargs):
                return fn(*a, **kw)

        return wrapped

    def __enter__(self):
        self._ctx = self.cfg._change_flags_ctx(**self.kwargs)
        return self._ctx.__enter__()

    def __exit__(self, *exc):
        return self._ctx.__exit__(*exc)


class Config:
    def __init__(self):
        object.__setattr__(self, "_params", {})
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_file_flags", None)

    def add(self, name: str, param: ConfigParam):
        param.name = name
        self._params[name] = param
        value = param.default
        # file < env priority
        if self._file_flags is None:
            object.__setattr__(self, "_file_flags", _read_rc_files())
        ext = {**self._file_flags, **_read_env_flags()}
        if name in ext:
            value = ext[name]
        if isinstance(value, str) or value is param.default:
            value = param.apply(value)
        param.validate(value)
        self._values[name] = value

    def __getattr__(self, name: str) -> Any:
        try:
            return object.__getattribute__(self, "_values")[name]
        except KeyError:
            raise AttributeError(f"No config flag {name!r}") from None

    def __setattr__(self, name: str, value: Any):
        params = object.__getattribute__(self, "_params")
        if name not in params:
            raise AttributeError(f"No config flag {name!r}")
        p = params[name]
        if not p.mutable:
            raise RuntimeError(f"Config flag {name} is immutable")
        value = p.apply(value)
        p.validate(value)
        object.__getattribute__(self, "_values")[name] = value

    @contextlib.contextmanager
    def _change_flags_ctx(self, **kwargs):
        old = {k: getattr(self, k) for k in kwargs}
        try:
            for k, v in kwargs.items():
                setattr(self, k, v)
            yield self
        finally:
            for k, v in old.items():
                setattr(self, k, v)

    def change_flags(self, **kwargs):
        """Context manager / decorator temporarily overriding flags."""
        return _ChangeFlagsDecorator(self, **kwargs)

    def get_print_summary(self):
        lines = []
        for name, p in sorted(self._params.items()):
            lines.append(f"{name} ({type(p).__name__}) = {getattr(self, name)!r}")
            if p.doc:
                lines.append(f"    {p.doc}")
        return "\n".join(lines)


config = Config()

# --- basic ---
config.add(
    "floatX",
    EnumStr("float32", ("float64", "bfloat16"), doc="Default float dtype for literals/shared."),
)
config.add(
    "cast_policy",
    EnumStr("custom", ("numpy+floatX", "numpy"),
            doc="Autocasting policy for python literals (reference "
                "configdefaults.py:200: custom = smallest representing "
                "dtype, see scalar.NumpyAutocaster)."),
)
config.add(
    "enable_x64",
    BoolParam(True, doc="Enable 64-bit dtypes in the XLA backend (jax_enable_x64)."),
)
config.add(
    "device",
    EnumStr("auto", ("tpu", "cpu"), doc="Preferred JAX platform for compiled functions."),
)
config.add(
    "compute_test_value",
    EnumStr("off", ("raise", "warn", "ignore", "pdb"), doc="Eager test-value propagation."),
)

# --- compile ---
config.add(
    "mode",
    EnumStr("FAST_RUN", ("FAST_COMPILE", "XLA", "PY", "DebugMode", "NanGuardMode"),
            doc="Default compilation mode."),
)
config.add(
    "linker",
    EnumStr("auto", ("xla", "py"), doc="Default linker; auto -> xla."),
)
config.add(
    "optimizer",
    EnumStr("auto", ("fast_run", "fast_compile", "None"), doc="Default rewrite query."),
)
config.add("optimizer_verbose", BoolParam(False, doc="Print each applied rewrite."))
config.add(
    "on_opt_error",
    EnumStr("warn", ("raise", "pdb", "ignore"), doc="Behavior when a rewrite fails."),
)
config.add(
    "on_shape_error",
    EnumStr("warn", ("raise",), doc="Behavior when infer_shape fails."),
)
config.add("profile", BoolParam(False, doc="Collect per-function profiling stats."))
config.add("profile_optimizer", BoolParam(False, doc="Collect rewrite timing."))

# --- XLA/TPU backend ---
config.add("xla__donate_updates", BoolParam(True, doc="Donate shared buffers with updates."))
config.add(
    "xla__jit", BoolParam(True, doc="jit-compile linked functions (off = eager, debugging).")
)
config.add(
    "xla__cache_dir",
    StrParam("", doc="Persistent XLA compilation cache dir ('' = disabled)."),
)
config.add(
    "xla__aot_cache",
    BoolParam(True, doc="With xla__cache_dir set, also pickle compiled "
                        "executables (jax serialize_executable) keyed by "
                        "graph signature: warm processes skip trace AND "
                        "compile (reference ModuleCache role)."),
)
config.add(
    "pallas__fusion",
    BoolParam(False, doc="Emit Pallas kernels for fused elemwise subgraphs (else rely on XLA fusion)."),
)
config.add(
    "sparse__routed_spmv",
    BoolParam(True, doc="Lower constant-pattern CSR matvec to the routed "
                        "MXU/lane-gather kernel (sparse/spmv.py)."),
)
config.add(
    "matmul_precision",
    EnumStr("default", ("high", "highest", "bfloat16", "float32"),
            doc="Precision for dot_general on the MXU."),
)

# --- debugging ---
config.add("traceback__limit", IntParam(8, doc="Frames kept in variable creation traces."))
config.add("exception_verbosity", EnumStr("low", ("high",), doc="Error detail level."))
config.add(
    "warn_float64",
    EnumStr("ignore", ("warn", "raise", "pdb"), doc="Action when a float64 variable is created."),
)
config.add("nan_guard__nan_is_error", BoolParam(True))
config.add("nan_guard__inf_is_error", BoolParam(True))
config.add("nan_guard__big_is_error", BoolParam(True))

# --- scan ---
config.add(
    "xla__matmul_precision",
    EnumStr("default", ("bfloat16", "tensorfloat32", "float32", "highest"),
            doc="jax default_matmul_precision for compiled functions: "
                "'bfloat16' runs MXU matmuls at bf16 inputs (fastest), "
                "'float32'/'highest' forces full-precision passes."),
)
config.add(
    "scan__unroll",
    IntParam(1, doc="lax.scan unroll factor for compiled for-loops: >1 "
                    "replicates the loop body, amortizing TPU per-iteration "
                    "control overhead (good for small, latency-bound "
                    "bodies). n_steps must be divisible or XLA pads."),
)
config.add(
    "scan__pallas",
    BoolParam(False, doc="EXPERIMENTAL: lower eligible Scan nodes (sit-sot "
                         "taps, float32 bodies built from elemwise/reduce/"
                         "dot/subtensor ops) into ONE Pallas TPU kernel with "
                         "an internal fori_loop — zero per-iteration kernel "
                         "launches. Ineligible scans fall back to lax.scan. "
                         "Combine with mode.including('onehot_gather') to "
                         "make gather/scatter bodies eligible."),
)
config.add("scan__allow_gc", BoolParam(False))
config.add("scan__allow_output_prealloc", BoolParam(True))

_done = True
