"""Per-op-family negative cases (VERDICT r4 item 9).

The reference generates bad_build/bad_runtime axes per op via
makeBroadcastTester (/root/reference/tests/tensor/utils.py:334); this
grid covers the same contract surface by hand: every op family gets
bad-dtype / bad-shape / bad-value cases that must raise — at graph
build (preferred) or at call time.
"""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt


def _raises(builder):
    with pytest.raises(Exception):
        ins, out, vals = builder()
        f = ptt.function(ins, out)
        outs = f(*vals)
        # force execution (device results are lazy until fetched)
        if isinstance(outs, (list, tuple)):
            [np.asarray(o) for o in outs]
        else:
            np.asarray(outs)


# --- indexing ---------------------------------------------------------------

def _sub_static_oob():
    x = pt.tensor("x", dtype="float64", shape=(5,))
    return [x], x[7], (np.zeros(5),)


def _sub_too_many_dims():
    x = pt.tensor("x", dtype="float64", shape=(5,))
    return [x], x[:, :, 0], (np.zeros(5),)


def _inc_sub_rank():
    x = pt.tensor("x", dtype="float64", shape=(4, 3))
    y = pt.tensor("y", dtype="float64", shape=(2, 2, 2))
    return [x, y], pt.set_subtensor(x[:2], y), (np.zeros((4, 3)),
                                                np.zeros((2, 2, 2)))


def _take_static_oob():
    x = pt.tensor("x", dtype="float64", shape=(4,))
    return [x], x[np.asarray([0, 9])], (np.zeros(4),)


def _bool_mask_wrong_len():
    x = pt.tensor("x", dtype="float64", shape=(4,))
    return [x], x[np.asarray([True, False, True])], (np.zeros(4),)


# --- linalg -----------------------------------------------------------------

def _cholesky_nonsquare():
    x = pt.tensor("x", dtype="float64", shape=(3, 4))
    from pytensor_tpu.tensor.linalg import cholesky

    return [x], cholesky(x), (np.zeros((3, 4)),)


def _solve_mismatch():
    from pytensor_tpu.tensor.linalg import solve

    a = pt.tensor("a", dtype="float64", shape=(3, 3))
    b = pt.tensor("b", dtype="float64", shape=(4,))
    return [a, b], solve(a, b), (np.eye(3), np.zeros(4))


def _det_vector():
    from pytensor_tpu.tensor.linalg import det

    x = pt.tensor("x", dtype="float64", shape=(3,))
    return [x], det(x), (np.zeros(3),)


def _matrix_inverse_rank1():
    from pytensor_tpu.tensor.linalg import inv

    x = pt.tensor("x", dtype="float64", shape=(3,))
    return [x], inv(x), (np.zeros(3),)


# --- shape / alloc ----------------------------------------------------------

def _alloc_rank_shrink():
    v = pt.tensor("v", dtype="float64", shape=(5,))
    return [v], pt.alloc(v, 3), (np.zeros(5),)


def _specify_shape_violation():
    x = pt.tensor("x", dtype="float64", shape=(None,))
    return [x], pt.specify_shape(x, (3,)), (np.zeros(5),)


def _reshape_bad_total():
    x = pt.tensor("x", dtype="float64", shape=(None,))
    return [x], pt.reshape(x, (2, 4)), (np.zeros(6),)


def _dimshuffle_bad_order():
    x = pt.tensor("x", dtype="float64", shape=(2, 3))
    return [x], x.dimshuffle((1, 0, 2)), (np.zeros((2, 3)),)


def _split_negative_sizes():
    a = pt.tensor("a", dtype="float64", shape=(6, 2))
    return [a], pt.split(a, splits_size=[2, -4, 8], n_splits=3, axis=0), \
        (np.zeros((6, 2)),)


# --- elemwise / reduction ---------------------------------------------------

def _runtime_broadcast():
    x = pt.tensor("x", dtype="float64", shape=(None, None))
    y = pt.tensor("y", dtype="float64", shape=(None, None))
    return [x, y], x + y, (np.zeros((1, 4)), np.zeros((3, 4)))


def _argmax_bad_axis():
    x = pt.tensor("x", dtype="float64", shape=(3, 4))
    return [x], pt.argmax(x, axis=2), (np.zeros((3, 4)),)


def _prod_repeated_axis():
    x = pt.tensor("x", dtype="float64", shape=(3, 4))
    return [x], pt.prod(x, axis=(0, 0)), (np.zeros((3, 4)),)


def _bitwise_on_float():
    x = pt.tensor("x", dtype="float64", shape=(3,))
    return [x], pt.bitwise_and(x, x), (np.zeros(3),)


# --- sort / einsum / pad / extra_ops ----------------------------------------

def _sort_bad_axis():
    from pytensor_tpu.tensor.sort import sort

    x = pt.tensor("x", dtype="float64", shape=(3, 4))
    return [x], sort(x, axis=5), (np.zeros((3, 4)),)


def _einsum_bad_spec():
    x = pt.tensor("x", dtype="float64", shape=(3, 4))
    y = pt.tensor("y", dtype="float64", shape=(5, 6))
    return [x, y], pt.einsum("ij,jk->ik", x, y), (np.zeros((3, 4)),
                                                  np.zeros((5, 6)))


def _einsum_bad_letters():
    x = pt.tensor("x", dtype="float64", shape=(3,))
    return [x], pt.einsum("i->ij", x), (np.zeros(3),)


def _pad_negative_width():
    from pytensor_tpu.tensor.pad import pad

    x = pt.tensor("x", dtype="float64", shape=(3, 3))
    return [x], pad(x, pad_width=-1), (np.zeros((3, 3)),)


def _repeat_negative():
    from pytensor_tpu.tensor.extra_ops import repeat

    x = pt.tensor("x", dtype="float64", shape=(3,))
    return [x], repeat(x, -2), (np.zeros(3),)


# --- random / scan / blockwise ----------------------------------------------

def _random_bad_size():
    from pytensor_tpu.tensor.random import normal

    return [], normal(0.0, 1.0, size=(-3,)), ()


def _scan_bad_seq_ndim():
    def step(s):
        return s + 1

    out, _ = ptt.scan(step, sequences=[np.float64(3.0)])
    return [], out, ()


def _blockwise_core_mismatch():
    a = pt.tensor("a", dtype="float64", shape=(2, 3, 4))
    b = pt.tensor("b", dtype="float64", shape=(2, 5, 6))
    return [a, b], pt.matmul(a, b), (np.zeros((2, 3, 4)),
                                     np.zeros((2, 5, 6)))


def _batched_dot_batch_mismatch():
    from pytensor_tpu.tensor.blas import BatchedDot

    a = pt.tensor("a", dtype="float64", shape=(None, 3, 4))
    b = pt.tensor("b", dtype="float64", shape=(None, 4, 2))
    return [a, b], BatchedDot()(a, b), (np.zeros((2, 3, 4)),
                                        np.zeros((3, 4, 2)))


# --- cast / construction -----------------------------------------------------

def _cast_to_invalid():
    x = pt.tensor("x", dtype="float64", shape=(3,))
    return [x], pt.cast(x, "float128"), (np.zeros(3),)


def _stack_rank_mismatch():
    a = pt.tensor("a", dtype="float64", shape=(3,))
    b = pt.tensor("b", dtype="float64", shape=(3, 3))
    return [a, b], pt.stack([a, b]), (np.zeros(3), np.zeros((3, 3)))


def _arange_bad_dtype():
    return [], pt.arange(0, 10, 1, dtype="nosuchdtype"), ()


FAMILY_ERROR_CASES = [
    ("sub_static_oob", _sub_static_oob),
    ("sub_too_many_dims", _sub_too_many_dims),
    ("inc_sub_rank", _inc_sub_rank),
    ("take_static_oob", _take_static_oob),
    ("bool_mask_wrong_len", _bool_mask_wrong_len),
    ("cholesky_nonsquare", _cholesky_nonsquare),
    ("solve_mismatch", _solve_mismatch),
    ("det_vector", _det_vector),
    ("matrix_inverse_rank1", _matrix_inverse_rank1),
    ("alloc_rank_shrink", _alloc_rank_shrink),
    ("specify_shape_violation", _specify_shape_violation),
    ("reshape_bad_total", _reshape_bad_total),
    ("dimshuffle_bad_order", _dimshuffle_bad_order),
    ("split_negative_sizes", _split_negative_sizes),
    ("runtime_broadcast", _runtime_broadcast),
    ("argmax_bad_axis", _argmax_bad_axis),
    ("prod_repeated_axis", _prod_repeated_axis),
    ("bitwise_on_float", _bitwise_on_float),
    ("sort_bad_axis", _sort_bad_axis),
    ("einsum_bad_spec", _einsum_bad_spec),
    ("einsum_bad_letters", _einsum_bad_letters),
    ("pad_negative_width", _pad_negative_width),
    ("repeat_negative", _repeat_negative),
    ("random_bad_size", _random_bad_size),
    ("scan_bad_seq_ndim", _scan_bad_seq_ndim),
    ("blockwise_core_mismatch", _blockwise_core_mismatch),
    ("batched_dot_batch_mismatch", _batched_dot_batch_mismatch),
    ("cast_to_invalid", _cast_to_invalid),
    ("stack_rank_mismatch", _stack_rank_mismatch),
    ("arange_bad_dtype", _arange_bad_dtype),
]


@pytest.mark.parametrize("name,builder", FAMILY_ERROR_CASES,
                         ids=[c[0] for c in FAMILY_ERROR_CASES])
def test_family_error_case(name, builder):
    _raises(builder)
