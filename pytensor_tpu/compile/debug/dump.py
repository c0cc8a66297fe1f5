"""Dump a compiled Function's graphs for offline inspection (reference
compile/debug/dump.py): debugprint text of the rewritten fgraph, the
rewrite-pipeline summary, and (XLA backend) the lowered HLO text.
"""

from __future__ import annotations

import io


def dump_function(fn, file=None, hlo=False):
    """Write a readable dump of a compiled Function.

    Sections: signature, rewritten graph (debugprint), profile stats if
    attached, and optionally the StableHLO of the jitted executable.
    Returns the text.
    """
    from pytensor_tpu.printing import debugprint

    buf = io.StringIO()
    print(f"Function {fn.name or '<anonymous>'}", file=buf)
    print(f"  backend: {fn._backend}", file=buf)
    print(f"  inputs: {[str(i) for i in fn.fgraph.inputs]}", file=buf)
    print(f"  outputs: {len(fn.fgraph.outputs)}", file=buf)
    print("-" * 60, file=buf)
    debugprint(fn.fgraph, file=buf)
    stats = getattr(fn, "profile_stats", None)
    if stats is not None:
        print("-" * 60, file=buf)
        stats.summary(file=buf)
    if hlo and fn._backend != "py":
        try:
            import numpy as np

            example = []
            for inp in fn.fgraph.inputs:
                shp = tuple(d if d is not None else 2 for d in inp.type.shape)
                example.append(np.zeros(shp, dtype=inp.type.numpy_dtype))
            print("-" * 60, file=buf)
            print(fn.vm.lower(*example).as_text(), file=buf)
        except Exception as e:
            print(f"  (HLO unavailable: {e!r})", file=buf)
    text = buf.getvalue()
    if file is not None:
        file.write(text)
    return text
