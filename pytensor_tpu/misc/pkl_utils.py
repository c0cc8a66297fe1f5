"""Checkpoint / serialization helpers.

Parallels /root/reference/pytensor/misc/pkl_utils.py (StripPickler:27 and
the zip-based dump/load persisting shared-variable arrays separately) —
the PyMC model-checkpointing path.  Compiled Functions serialize as
(graph + shared values); unpickling recompiles through the normal
pipeline (the reference's FunctionMaker round trip).
"""

from __future__ import annotations

import io
import pickle
import zipfile

import numpy as np


class StripPickler(pickle.Pickler):
    """Pickler that drops heavyweight / non-portable attributes."""

    def __init__(self, file, protocol=pickle.HIGHEST_PROTOCOL, extra_tag_to_remove=None):
        super().__init__(file, protocol)
        self.tags_to_remove = ["trace", "test_value", *(extra_tag_to_remove or [])]

    def save(self, obj, save_persistent_id=True):
        from pytensor_tpu.utils import Scratchpad

        if isinstance(obj, Scratchpad):
            for tag in self.tags_to_remove:
                if hasattr(obj, tag):
                    try:
                        delattr(obj, tag)
                    except AttributeError:
                        pass
        return super().save(obj, save_persistent_id)


def dump(obj, file_handler, protocol=pickle.HIGHEST_PROTOCOL,
         persistent_id_prefix="shared"):
    """Zip-dump: pickle the object with shared-variable ndarrays stored as
    separate .npy entries (large arrays stay out of the pickle stream)."""
    from pytensor_tpu.compile.sharedvalue import SharedVariable

    arrays: dict[str, np.ndarray] = {}

    class _P(pickle.Pickler):
        def persistent_id(self, o):
            if isinstance(o, SharedVariable):
                key = f"{persistent_id_prefix}_{len(arrays)}"
                val = o.container.storage[0]
                arrays[key] = np.asarray(val)
                return ("shared_variable", key, str(type(o).__name__),
                        pickle.dumps((o.type, o.name)))
            return None

    buf = io.BytesIO()
    _P(buf, protocol).dump(obj)
    with zipfile.ZipFile(file_handler, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("pkl", buf.getvalue())
        for key, arr in arrays.items():
            abuf = io.BytesIO()
            np.save(abuf, arr, allow_pickle=False)
            z.writestr(f"{key}.npy", abuf.getvalue())


def load(file_handler):
    """Load an object written by :func:`dump` (shared values restored)."""
    with zipfile.ZipFile(file_handler, "r") as z:
        payload = z.read("pkl")

        class _U(pickle.Unpickler):
            def persistent_load(self, pid):
                kind, key, _clsname, meta = pid
                if kind != "shared_variable":
                    raise pickle.UnpicklingError(f"unknown pid {kind}")
                typ, name = pickle.loads(meta)
                arr = np.load(io.BytesIO(z.read(f"{key}.npy")), allow_pickle=False)
                from pytensor_tpu.compile.sharedvalue import SharedVariable

                return SharedVariable(typ, arr, name=name)

        return _U(io.BytesIO(payload)).load()


def dump_function(fn, file_handler):
    """Serialize a compiled Function as (graph spec + shared values)."""
    from pytensor_tpu.compile.sharedvalue import SharedVariable

    spec = {
        "explicit": [wi.variable for wi in fn.explicit_inputs],
        "outputs": fn.fgraph.outputs[: fn.n_user_outputs],
        "n_user_outputs": fn.n_user_outputs,
        "unpack_single": fn.unpack_single,
        "name": fn.name,
    }
    # NOTE: the fgraph references cloned inputs; rebuild from original specs
    dump({"inputs": spec["explicit"], "graph": fn.fgraph, "meta": spec},
         file_handler)


def load_function(file_handler, mode=None):
    data = load(file_handler)
    from pytensor_tpu.compile.maker import function

    fg = data["graph"]
    meta = data["meta"]
    outs = fg.outputs[: meta["n_user_outputs"]]
    explicit = [v for v in fg.inputs
                if not hasattr(v, "container")]
    f = function(explicit,
                 outs[0] if meta["unpack_single"] and len(outs) == 1 else outs,
                 mode=mode, name=meta["name"], on_unused_input="ignore")
    return f
