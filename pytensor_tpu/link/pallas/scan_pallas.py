"""Whole-loop Pallas lowering for Scan.

The reference's per-step cost floor is its VM dispatch loop
(scan/op.py:1827 ``perform``); ours under lax.scan is the ~10-15 XLA
kernel launches per iteration — a latency wall for small, sequential
bodies (MCMC leapfrog, small RNNs).  This module lowers an eligible Scan
into ONE ``pallas_call``: the inner graph's jaxpr is evaluated inside a
``lax.fori_loop`` in the kernel, so state, constants and traces live in
VMEM and per-iteration kernel-launch overhead is zero.  The hand-written
existence proof is models/radon_pallas.py (~1 us/leapfrog step).

Eligibility (conservative; anything else falls back to lax.scan):
- no while-condition, taps == (-1,) for every state; sequences are
  supported when their full (T, *row) arrays are static-shaped and fit
  the VMEM budget (rows are read at an untiled leading dim — free);
- no untraced non-float state (RNG keys need jax.random inside the
  kernel, which Mosaic does not trace);
- every inner op from a whitelist known to lower through Mosaic
  (elemwise/reduce/dot/shape/subtensor families — no advanced indexing:
  rewrite gathers with mode.including('onehot_gather') first);
- static n_steps, float32/bfloat16/int32 types, all shapes static.

Mosaic quirks handled here (discovered empirically on v5e):
- captured array constants must be kernel operands: the body jaxpr's
  consts are hoisted via jax.make_jaxpr and passed as inputs;
- 1-D matvec results feeding reductions miscompile ("only constant
  accumulators supported"), and scatter/scatter-add/dynamic_slice are
  unsupported: the body traces under link/xla/dispatch.mosaic_safe(),
  which switches Dot to 2-D matmuls and IncSubtensor to static
  slice+concat updates (the default XLA path keeps the faster
  scatter/DUS forms);
- nested pallas_call is unsupported: the body traces with
  config.pallas__fusion disabled.
"""

from __future__ import annotations

import numpy as np

_WHITELIST = {
    "Elemwise", "FusedElemwise", "DimShuffle", "CAReduce", "Dot", "Dot22",
    "Gemm", "Dot22Scalar", "Subtensor", "IncSubtensor", "Alloc",
    "SpecifyShape", "Reshape", "Join", "MakeVector", "TensorFromScalar",
    "ScalarFromTensor", "DeepCopyOp", "ViewOp", "Split", "ARange",
    # static shapes are enforced below, so these fold to constants
    "Shape", "Shape_i",
}

_OK_DTYPES = ("float32", "bfloat16", "bool",
              "int8", "int16", "int32", "int64",
              "uint8", "uint16", "uint32")


def pallas_scan_eligible(op, node=None) -> bool:
    info = op.info
    if info.as_while or info.n_nit_sot < 0:
        return False
    if any(t != (-1,) for t in info.taps):
        return False
    if info.n_seqs:
        if node is None:
            return False
        # outer sequences live whole in VMEM: need static (T, *row)
        for s in node.inputs[1: 1 + info.n_seqs]:
            shp = getattr(s.type, "shape", None)
            if shp is None or any(d is None for d in shp):
                return False
    for v in op.fgraph.inputs + op.fgraph.outputs:
        dt = getattr(v.type, "dtype", None)
        if dt is None or dt not in _OK_DTYPES:
            return False
    from pytensor_tpu.graph.basic import Constant
    from pytensor_tpu.graph.traversal import ancestors

    for inner_node in op.fgraph.apply_nodes:
        if type(inner_node.op).__name__ not in _WHITELIST:
            return False
        for o in inner_node.outputs:
            shp = getattr(o.type, "shape", None)
            if shp is None or any(s is None for s in shp):
                return False
            if o.type.dtype not in _OK_DTYPES and not str(
                    o.type.dtype).startswith("int"):
                return False
    # VMEM budget: states + constants + whole sequences + one trace row
    total = 0
    for v in op.fgraph.inputs:
        shp = getattr(v.type, "shape", ()) or (1,)
        if any(s is None for s in shp):
            return False  # dynamic dims cannot live in a fixed VMEM block
        total += int(np.prod(shp, initial=1)) * 4
    if node is not None:
        for s in node.inputs[1: 1 + info.n_seqs]:
            total += int(np.prod(s.type.shape, initial=1)) * 4
    for v in ancestors(op.fgraph.outputs):
        if isinstance(v, Constant) and getattr(v.type, "ndim", 0) >= 1:
            total += int(np.asarray(v.data).size) * 4
    return total <= (4 << 20)


def make_pallas_scan_fn(op, node):
    """Return scan_fn(n_steps, *outer) running the whole loop in one
    Pallas kernel, or None when the scan is not eligible."""
    if not pallas_scan_eligible(op, node):
        return None

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from pytensor_tpu.config import config
    from pytensor_tpu.link.xla.dispatch import _concrete
    from pytensor_tpu.link.xla.linker import fgraph_to_jax

    info = op.info
    inner = fgraph_to_jax(op.fgraph)
    n_seqs = info.n_seqs
    n_states = info.n_states
    n_unt = info.n_untraced
    n_nit = info.n_nit_sot
    interpret = jax.default_backend() == "cpu"  # tests run on the CPU mesh

    state_shapes = [tuple(o.type.shape) for o in op.inner_state_outs()]
    state_dtypes = [o.type.dtype for o in op.inner_state_outs()]
    unt_shapes = [tuple(o.type.shape) for o in op.inner_untraced_outs()]
    unt_dtypes = [o.type.dtype for o in op.inner_untraced_outs()]
    nit_shapes = [tuple(o.type.shape) for o in op.inner_nit_sot_outs()]
    nit_dtypes = [o.type.dtype for o in op.inner_nit_sot_outs()]
    in_shapes = [tuple(v.type.shape) for v in op.fgraph.inputs]
    in_dtypes = [v.type.dtype for v in op.fgraph.inputs]

    # Trace the body once, VMAPPED over a size-1 leading axis: every
    # state/operand is natively (1, *s) inside the kernel, so the loop
    # carry never changes rank.  Mosaic SIGABRTs on reshapes that alter
    # the tiled trailing-two-dims layout of a loop-carried value (e.g.
    # (5,) -> (1,5) around a matvec); under vmap those reshapes never
    # exist.  Float array consts are hoisted to kernel operands.
    ex_args = [jnp.zeros((1, *s), d) for s, d in zip(in_shapes, in_dtypes)]
    from pytensor_tpu.link.xla.dispatch import mosaic_safe

    with config.change_flags(pallas__fusion=False), mosaic_safe():
        closed = jax.make_jaxpr(jax.vmap(lambda *a: tuple(inner(*a))))(
            *ex_args)
    all_consts = list(closed.consts)
    big_idx = [i for i, c in enumerate(all_consts)
               if np.ndim(c) >= 1
               and np.dtype(np.asarray(c).dtype).kind in "f"]
    big_vals = [jnp.asarray(all_consts[i]) for i in big_idx]

    def run_body(args, big):
        consts = list(all_consts)
        for i, v in zip(big_idx, big):
            consts[i] = v
        return jax.core.eval_jaxpr(closed.jaxpr, consts, *args)

    # Mosaic layout: the LAST TWO dims of every ref are tiled (8x128 for
    # f32); dynamic indexing is only free on UNTILED leading dims.  In
    # kernel space every value carries the vmap batch dim: bs = (1, *s).
    # Refs are padded to rank >= 2 ((1,) -> (1,1)); trace refs get shape
    # (T, *pad(bs)) so the per-step store at row i hits an untiled dim —
    # a bare (T,) trace ref dies with "index in dimension 0 is a
    # multiple of 128".  Rank-preserving loads/stores of NON-carried
    # values are free; only carried values must keep a fixed layout.
    def _bs(s):
        return (1, *s)

    def _pad(bs):
        return (1, 1) if len(bs) == 1 else tuple(bs)

    def _cpad(s):
        # raw const shape -> rank >= 2 operand shape: () -> (1,1),
        # (n,) -> (1,n) (row layout; see the Dot note in dispatch)
        return (1, 1) if len(s) == 0 else ((1, s[0]) if len(s) == 1
                                           else tuple(s))

    big_shapes = [tuple(np.shape(v)) for v in big_vals]
    big_ops = [v.reshape(_cpad(tuple(v.shape))) for v in big_vals]

    def scan_fn(n_steps, *outer):
        T = int(_concrete(n_steps, "pallas scan n_steps"))

        def as_op(v, s):
            # outer value (*s) -> kernel operand (*pad(bs))
            return jnp.asarray(v).reshape(_pad(_bs(s)))

        seq_raw = outer[: n_seqs]
        init_raw = outer[n_seqs: n_seqs + n_states]
        unt_raw = outer[n_seqs + n_states: n_seqs + n_states + n_unt]
        ns_raw = outer[n_seqs + n_states + n_unt:]
        in_seq_shapes = in_shapes[: n_seqs]  # per-step slice shapes
        in_state_shapes = in_shapes[n_seqs: n_seqs + n_states]
        in_unt_shapes = in_shapes[n_seqs + n_states:
                                  n_seqs + n_states + n_unt]
        in_ns_shapes = in_shapes[n_seqs + n_states + n_unt:]
        # whole sequences as (T, *pad(bs_row)) VMEM operands
        seq_ops = [jnp.asarray(v)[:T].reshape((T, *_pad(_bs(s))))
                   for v, s in zip(seq_raw, in_seq_shapes)]
        inits = [as_op(v, s) for v, s in zip(init_raw, in_state_shapes)]
        unt0 = [as_op(v, s) for v, s in zip(unt_raw, in_unt_shapes)]
        non_seqs = [as_op(v, s) for v, s in zip(ns_raw, in_ns_shapes)]

        n_in = n_seqs + n_states + n_unt + len(non_seqs) + len(big_ops)

        def load(r, shape):
            v = r[...]
            return v if v.shape == tuple(shape) else v.reshape(shape)

        def kernel(*refs):
            seq_refs = refs[:n_seqs]
            init_refs = refs[n_seqs: n_seqs + n_states]
            unt_refs = refs[n_seqs + n_states: n_seqs + n_states + n_unt]
            rest = refs[n_seqs + n_states + n_unt:]
            nonseq_refs = rest[: len(non_seqs)]
            const_refs = rest[len(non_seqs): len(non_seqs) + len(big_ops)]
            out_refs = refs[n_in:]
            trace_refs = out_refs[:n_states]
            out_unt_refs = out_refs[n_states: n_states + n_unt]
            nit_refs = out_refs[n_states + n_unt:]

            nonseq_vals = tuple(load(r, _bs(s))
                                for r, s in zip(nonseq_refs, in_ns_shapes))
            big = tuple(load(r, s)
                        for r, s in zip(const_refs, big_shapes))

            def body(i, carry):
                states, unt = carry
                # per-step sequence rows (not loop-carried: the
                # rank-adjusting reshape of a fresh load is fine)
                seq_vals = tuple(
                    seq_refs[k][pl.ds(i, 1)].reshape(_bs(in_seq_shapes[k]))
                    for k in range(n_seqs))
                outs = run_body(seq_vals + tuple(states) + tuple(unt)
                                + nonseq_vals, big)
                new_states = tuple(outs[:n_states])
                new_unt = tuple(outs[n_states: n_states + n_unt])
                nits = tuple(outs[n_states + n_unt:])
                for k in range(n_states):
                    trace_refs[k][pl.ds(i, 1)] = new_states[k].reshape(
                        (1, *_pad(_bs(state_shapes[k]))))
                for m in range(n_nit):
                    nit_refs[m][pl.ds(i, 1)] = nits[m].reshape(
                        (1, *_pad(_bs(nit_shapes[m]))))
                return new_states, new_unt

            carry0 = (tuple(load(r, _bs(s))
                            for r, s in zip(init_refs, in_state_shapes)),
                      tuple(load(r, _bs(s))
                            for r, s in zip(unt_refs, in_unt_shapes)))
            _, unt_f = jax.lax.fori_loop(0, T, body, carry0)
            for u in range(n_unt):
                out_unt_refs[u][...] = unt_f[u].reshape(
                    _pad(_bs(unt_shapes[u])))

        out_shape = (
            [jax.ShapeDtypeStruct((T, *_pad(_bs(s))), d)
             for s, d in zip(state_shapes, state_dtypes)]
            + [jax.ShapeDtypeStruct(_pad(_bs(s)), d)
               for s, d in zip(unt_shapes, unt_dtypes)]
            + [jax.ShapeDtypeStruct((T, *_pad(_bs(s))), d)
               for s, d in zip(nit_shapes, nit_dtypes)]
        )
        res = pl.pallas_call(kernel, out_shape=tuple(out_shape),
                             interpret=interpret)(
            *seq_ops, *inits, *unt0, *non_seqs, *big_ops)
        if not isinstance(res, (list, tuple)):
            res = (res,)
        res = list(res)
        for k in range(n_states):
            res[k] = res[k].reshape((T, *state_shapes[k]))
        for u in range(n_unt):
            res[n_states + u] = res[n_states + u].reshape(unt_shapes[u])
        for m in range(n_nit):
            res[n_states + n_unt + m] = res[n_states + n_unt + m].reshape(
                (T, *nit_shapes[m]))
        return tuple(res) if len(res) > 1 else res[0]

    return scan_fn
