"""Indexing contract grids: basic slices, advanced integer indexing,
constant boolean masks, set/inc_subtensor — checked cell-by-cell against
numpy semantics (the reference's tests/tensor/test_subtensor.py grid
role).  Each (family, dtype) compiles ONE function over all cases."""

from __future__ import annotations

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt

rng = np.random.default_rng(77)


def _v(shape, dtype="float64"):
    return rng.standard_normal(shape).astype(dtype) if shape else \
        np.asarray(rng.standard_normal(), dtype=dtype)


# each entry: (label, build(x), numpy(x))
BASIC_CASES = [
    ("int", lambda x: x[2], lambda v: v[2]),
    ("neg_int", lambda x: x[-1], lambda v: v[-1]),
    ("slice", lambda x: x[1:4], lambda v: v[1:4]),
    ("slice_neg", lambda x: x[-3:-1], lambda v: v[-3:-1]),
    ("strided", lambda x: x[::2], lambda v: v[::2]),
    ("reversed", lambda x: x[::-1], lambda v: v[::-1]),
    ("rev_strided", lambda x: x[4:1:-2], lambda v: v[4:1:-2]),
    ("open_start", lambda x: x[:3], lambda v: v[:3]),
    ("open_end", lambda x: x[3:], lambda v: v[3:]),
    ("full", lambda x: x[:], lambda v: v[:]),
    ("empty", lambda x: x[3:3], lambda v: v[3:3]),
    ("over_end", lambda x: x[2:100], lambda v: v[2:100]),
]


def test_basic_indexing_1d_grid():
    shape = (6,)
    ins, outs, expects = [], [], []
    for label, build, npf in BASIC_CASES:
        x = pt.tensor(f"x_{label}", dtype="float64", shape=shape)
        ins.append(x)
        outs.append(build(x))
    f = ptt.function(ins, outs)
    vals = [_v(shape) for _ in BASIC_CASES]
    for (label, build, npf), got, v in zip(BASIC_CASES, f(*vals), vals):
        e = npf(v)
        got = np.asarray(got)
        assert got.shape == e.shape, label
        np.testing.assert_array_equal(got, e, err_msg=label)


MATRIX_CASES = [
    ("row", lambda x: x[1], lambda v: v[1]),
    ("col", lambda x: x[:, 2], lambda v: v[:, 2]),
    ("cell", lambda x: x[1, 2], lambda v: v[1, 2]),
    ("rows", lambda x: x[1:3], lambda v: v[1:3]),
    ("cols_strided", lambda x: x[:, ::2], lambda v: v[:, ::2]),
    ("block", lambda x: x[1:3, 2:4], lambda v: v[1:3, 2:4]),
    ("rev_rows", lambda x: x[::-1], lambda v: v[::-1]),
    ("rev_both", lambda x: x[::-1, ::-1], lambda v: v[::-1, ::-1]),
    ("newaxis_front", lambda x: x[None], lambda v: v[None]),
    ("newaxis_mid", lambda x: x[:, None, :], lambda v: v[:, None, :]),
    ("ellipsis_col", lambda x: x[..., 1], lambda v: v[..., 1]),
    ("ellipsis_newaxis", lambda x: x[..., None], lambda v: v[..., None]),
    ("mixed", lambda x: x[1, 1:4:2], lambda v: v[1, 1:4:2]),
]


def test_basic_indexing_2d_grid():
    shape = (4, 5)
    ins, outs = [], []
    for label, build, npf in MATRIX_CASES:
        x = pt.tensor(f"x_{label}", dtype="float64", shape=shape)
        ins.append(x)
        outs.append(build(x))
    f = ptt.function(ins, outs)
    vals = [_v(shape) for _ in MATRIX_CASES]
    for (label, build, npf), got, v in zip(MATRIX_CASES, f(*vals), vals):
        e = npf(v)
        got = np.asarray(got)
        assert got.shape == np.asarray(e).shape, label
        np.testing.assert_array_equal(got, e, err_msg=label)


ADV_CASES = [
    ("vec_rows", lambda x, i: x[i], lambda v, iv: v[iv]),
    ("vec_rows_neg", lambda x, i: x[-i - 1], lambda v, iv: v[-iv - 1]),
    ("repeated", lambda x, i: x[pt.join(0, i, i)],
     lambda v, iv: v[np.concatenate([iv, iv])]),
    ("rows_then_slice", lambda x, i: x[i][:, 1:3],
     lambda v, iv: v[iv][:, 1:3]),
    ("gather_last", lambda x, i: x.T[i], lambda v, iv: v.T[iv]),
]


def test_advanced_indexing_grid():
    shape = (5, 4)
    iv = np.array([0, 3, 1], dtype="int64")
    ins, outs = [], []
    for label, build, npf in ADV_CASES:
        x = pt.tensor(f"x_{label}", dtype="float64", shape=shape)
        i = pt.tensor(f"i_{label}", dtype="int64", shape=(3,))
        ins += [x, i]
        outs.append(build(x, i))
    f = ptt.function(ins, outs)
    vals = []
    checks = []
    for label, build, npf in ADV_CASES:
        v = _v(shape)
        vals += [v, iv]
        checks.append((label, npf(v, iv)))
    for (label, e), got in zip(checks, f(*vals)):
        got = np.asarray(got)
        assert got.shape == e.shape, label
        np.testing.assert_array_equal(got, e, err_msg=label)


def test_constant_bool_mask_grid():
    """Graph-time-constant boolean masks lower to integer indexing."""
    shape = (6,)
    masks = [
        np.array([1, 0, 1, 0, 1, 1], bool),
        np.zeros(6, bool),
        np.ones(6, bool),
    ]
    ins, outs, checks = [], [], []
    for k, m in enumerate(masks):
        x = pt.tensor(f"x{k}", dtype="float64", shape=shape)
        ins.append(x)
        outs.append(x[pt.constant(m)])
    f = ptt.function(ins, outs)
    vals = [_v(shape) for _ in masks]
    for m, got, v in zip(masks, f(*vals), vals):
        np.testing.assert_array_equal(np.asarray(got), v[m])


SET_CASES = [
    ("set_int", lambda x, y: pt.set_subtensor(x[1], y[0]),
     lambda v, w: _np_set(v, (1,), w[0])),
    ("set_slice", lambda x, y: pt.set_subtensor(x[1:3], y[:2]),
     lambda v, w: _np_set(v, slice(1, 3), w[:2])),
    ("inc_slice", lambda x, y: pt.inc_subtensor(x[2:5], y[:3]),
     lambda v, w: _np_inc(v, slice(2, 5), w[:3])),
    ("set_strided", lambda x, y: pt.set_subtensor(x[::2], y[:3]),
     lambda v, w: _np_set(v, slice(None, None, 2), w[:3])),
    ("inc_reversed", lambda x, y: pt.inc_subtensor(x[::-1], y),
     lambda v, w: _np_inc(v, slice(None, None, -1), w)),
]


def _np_set(v, idx, val):
    out = v.copy()
    out[idx] = val
    return out


def _np_inc(v, idx, val):
    out = v.copy()
    out[idx] = out[idx] + val
    return out


def test_set_inc_subtensor_grid():
    shape = (5,)
    ins, outs, checks = [], [], []
    for label, build, npf in SET_CASES:
        x = pt.tensor(f"x_{label}", dtype="float64", shape=shape)
        y = pt.tensor(f"y_{label}", dtype="float64", shape=shape)
        ins += [x, y]
        outs.append(build(x, y))
    f = ptt.function(ins, outs)
    vals, expect = [], []
    for label, build, npf in SET_CASES:
        v, w = _v(shape), _v(shape)
        vals += [v, w]
        expect.append((label, npf(v, w)))
    for (label, e), got in zip(expect, f(*vals)):
        np.testing.assert_allclose(np.asarray(got), e, rtol=1e-12,
                                   err_msg=label)


def test_advanced_inc_subtensor_accumulates_duplicates():
    x = pt.tensor("x", dtype="float64", shape=(5,))
    i = pt.constant(np.array([1, 1, 3], dtype="int64"))
    y = pt.constant(np.array([10.0, 20.0, 5.0]))
    f = ptt.function([x], pt.inc_subtensor(x[i], y))
    v = np.zeros(5)
    got = np.asarray(f(v))
    np.testing.assert_allclose(got, [0, 30, 0, 5, 0])


def test_grad_through_indexing_grid():
    for label, build, npf in [
        ("slice", lambda x: x[1:4].sum(), None),
        ("strided", lambda x: x[::2].sum(), None),
        ("reversed", lambda x: (x[::-1] * np.arange(6.0)).sum(), None),
        ("adv", lambda x: x[pt.constant(np.array([0, 2, 2]))].sum(), None),
    ]:
        ptt.verify_grad(build, [_v((6,))],
                        rng=np.random.default_rng(3), abs_tol=1e-6,
                        rel_tol=1e-6)


def test_indexing_error_grid():
    x = pt.tensor("x", dtype="float64", shape=(4,))
    # static out-of-bounds int index rejected at graph build
    with pytest.raises(Exception):
        x[7]
    # too many dims
    with pytest.raises(Exception):
        x[1, 2]
    m = pt.tensor("m", dtype="float64", shape=(3, 3))
    with pytest.raises(Exception):
        m[1, 2, 3]