"""xtensor reduction/shape semantic grids vs the reference's xarray
conventions (reference xtensor/reduction.py, xtensor/shape.py).

Expectations are computed with numpy following the reference lowering
(xtensor/rewriting/shape.py lower_stack:27 / lower_unstack:51): stacked
dims merge IN OPERAND ORDER at the end; unstacked dims land at the end
after the batch dims.  Round-4 grids: writing them caught (and the
fixes shipped with them) a user-order stack bug and an unstack
dim-placement bug in this build.
"""

import itertools

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor  # noqa: F401
from pytensor_tpu.xtensor import reduction as xr
from pytensor_tpu.xtensor import shape as xs
from pytensor_tpu.xtensor.type import xtensor

DIMS = ("a", "b", "c")
SHAPE = (2, 3, 4)


def _x(dtype="float64"):
    return xtensor("x", dims=DIMS, shape=SHAPE, dtype=dtype)


def _v(dtype="float64"):
    rng = np.random.default_rng(0)
    if dtype == "bool":
        return rng.random(SHAPE) < 0.5
    if np.dtype(dtype).kind in "iu":
        return rng.integers(1, 5, SHAPE).astype(dtype)
    return rng.standard_normal(SHAPE).astype(dtype)


def _run(expr, x, xv):
    f = ptt.function([x], expr.values)
    return np.asarray(f(xv))


ALL_DIM_SUBSETS = [
    s for n in range(1, 4) for s in itertools.combinations(DIMS, n)
]


class TestReductionGrids:
    @pytest.mark.parametrize("dims", ALL_DIM_SUBSETS + [None, ...])
    @pytest.mark.parametrize("name,npf", [
        ("sum", np.sum), ("prod", np.prod), ("max", np.max),
        ("min", np.min), ("mean", np.mean),
    ])
    def test_reduce_values(self, dims, name, npf):
        x = _x()
        xv = _v()
        got = _run(getattr(xr, name)(x, dims), x, xv)
        axes = (tuple(DIMS.index(d) for d in dims)
                if isinstance(dims, tuple) else None)
        np.testing.assert_allclose(got, npf(xv, axis=axes), rtol=1e-12)

    @pytest.mark.parametrize("dims", ALL_DIM_SUBSETS)
    def test_reduced_dims_dropped_in_order(self, dims):
        x = _x()
        out = xr.sum(x, dims)
        assert out.type.dims == tuple(d for d in DIMS if d not in dims)

    @pytest.mark.parametrize("ddof", [0, 1])
    @pytest.mark.parametrize("dims", [("a",), ("a", "c"), None])
    def test_var_std(self, ddof, dims):
        x = _x()
        xv = _v()
        axes = (tuple(DIMS.index(d) for d in dims)
                if dims is not None else None)
        np.testing.assert_allclose(
            _run(xr.var(x, dims, ddof=ddof), x, xv),
            np.var(xv, axis=axes, ddof=ddof), rtol=1e-10)
        np.testing.assert_allclose(
            _run(xr.std(x, dims, ddof=ddof), x, xv),
            np.std(xv, axis=axes, ddof=ddof), rtol=1e-10)

    @pytest.mark.parametrize("dtype,want", [
        ("bool", "int64"), ("int8", "int64"), ("int32", "int64"),
        ("uint8", "uint64"), ("float32", "float32"),
        ("float64", "float64"),
    ])
    def test_sum_upcasts_discrete(self, dtype, want):
        out = xr.sum(_x(dtype), "a")
        assert out.type.dtype == want

    @pytest.mark.parametrize("dtype", ["bool", "int32", "float64"])
    @pytest.mark.parametrize("name,npf", [("all", np.all), ("any", np.any)])
    def test_bool_reduce_coerces(self, dtype, name, npf):
        x = _x(dtype)
        xv = _v(dtype)
        if dtype == "int32":
            xv[0, 0, 0] = 0
        out = getattr(xr, name)(x, "b")
        assert out.type.dtype == "bool"
        np.testing.assert_array_equal(
            _run(out, x, xv), npf(xv != 0, axis=1))

    @pytest.mark.parametrize("op,cls_np", [
        ("add", np.add), ("mul", np.multiply), ("maximum", np.maximum),
        ("minimum", np.minimum),
    ])
    def test_generic_reduce_entry(self, op, cls_np):
        x = _x()
        xv = _v()
        got = _run(xr.reduce(x, ("a", "b"), binary_op=op), x, xv)
        np.testing.assert_allclose(got, cls_np.reduce(
            xv.reshape(-1, SHAPE[2]), axis=0), rtol=1e-12)

    def test_generic_reduce_rejects_unknown_op(self):
        with pytest.raises(NotImplementedError, match="binary_op"):
            xr.reduce(_x(), "a", binary_op="sub")

    @pytest.mark.parametrize("dim", DIMS)
    @pytest.mark.parametrize("name,npf", [
        ("cumsum", np.cumsum), ("cumprod", np.cumprod),
    ])
    def test_cumreduce(self, dim, name, npf):
        x = _x()
        xv = _v()
        out = getattr(xr, name)(x, dim)
        assert out.type.dims == DIMS  # cum keeps dims
        np.testing.assert_allclose(
            _run(out, x, xv), npf(xv, axis=DIMS.index(dim)), rtol=1e-12)

    def test_cumreduce_multi_dim_chains(self):
        x = _x()
        xv = _v()
        got = _run(xr.cumsum(x, ("a", "b")), x, xv)
        np.testing.assert_allclose(
            got, np.cumsum(np.cumsum(xv, axis=0), axis=1), rtol=1e-12)


class TestStackGrids:
    @pytest.mark.parametrize(
        "dims", [s for n in (2, 3) for s in itertools.permutations(DIMS, n)])
    def test_stack_merges_in_operand_order(self, dims):
        x = _x()
        xv = _v()
        out = xs.stack(x, z=dims)
        keep = tuple(d for d in DIMS if d not in dims)
        assert out.type.dims == keep + ("z",)
        sizes = dict(zip(DIMS, SHAPE))
        assert out.type.shape[-1] == int(np.prod([sizes[d] for d in dims]))
        # expectation follows the reference lowering: stacked axes in
        # OPERAND order moved to the end, then C-order reshape
        src = [DIMS.index(d) for d in DIMS if d in dims]
        exp = np.moveaxis(xv, src, range(-len(src), 0))
        exp = exp.reshape(exp.shape[:len(keep)] + (-1,))
        np.testing.assert_array_equal(_run(out, x, xv), exp)

    def test_stack_single_dim_is_transpose(self):
        x = _x()
        xv = _v()
        out = xs.stack(x, z=("a",))
        assert out.type.dims == ("b", "c", "z")
        np.testing.assert_array_equal(
            _run(out, x, xv), np.moveaxis(xv, 0, -1))

    def test_stack_all_dims(self):
        x = _x()
        xv = _v()
        out = xs.stack(x, z=DIMS)
        assert out.type.dims == ("z",)
        np.testing.assert_array_equal(_run(out, x, xv), xv.reshape(-1))

    def test_stack_chained(self):
        x = _x()
        out = xs.stack(xs.stack(x, u=("a", "b")), w=("c", "u"))
        assert out.type.dims == ("w",)

    def test_stack_errors(self):
        x = _x()
        with pytest.raises(ValueError, match="must not be in"):
            xs.XStack("a", ("a", "b"))(x)
        with pytest.raises(ValueError, match="already present"):
            xs.stack(x, a=("b", "c"))
        with pytest.raises(ValueError, match="unknown dim"):
            xs.stack(x, z=("nope",))
        with pytest.raises(ValueError, match="empty"):
            xs.XStack("z", ())(x)

    @pytest.mark.parametrize("dims", [("a", "b"), ("c", "a"), DIMS])
    def test_unstack_roundtrip(self, dims):
        x = _x()
        xv = _v()
        sizes = dict(zip(DIMS, SHAPE))
        stacked = xs.stack(x, z=dims)
        # operand order is what stack used, so round-trip with that
        opord = tuple(d for d in DIMS if d in dims)
        back = xs.unstack(stacked,
                          z={d + "2": sizes[d] for d in opord})
        keep = tuple(d for d in DIMS if d not in dims)
        assert back.type.dims == keep + tuple(d + "2" for d in opord)
        src = [DIMS.index(d) for d in opord]
        exp = np.moveaxis(xv, src, range(-len(src), 0))
        np.testing.assert_array_equal(_run(back, x, xv), exp)

    def test_unstack_places_new_dims_last(self):
        x = xtensor("x", dims=("z", "b"), shape=(8, 3), dtype="float64")
        out = xs.unstack(x, z={"p": 2, "q": 4})
        assert out.type.dims == ("b", "p", "q")
        assert out.type.shape == (3, 2, 4)
        xv = np.arange(24.).reshape(8, 3)
        exp = np.moveaxis(xv, 0, -1).reshape(3, 2, 4)
        np.testing.assert_array_equal(_run(out, x, xv), exp)

    def test_unstack_errors(self):
        x = xtensor("x", dims=("z", "b"), shape=(8, 3), dtype="float64")
        with pytest.raises(ValueError, match="multiply"):
            xs.unstack(x, z={"p": 3, "q": 4})
        with pytest.raises(ValueError, match="unknown"):
            xs.unstack(x, nope={"p": 2, "q": 4})
        with pytest.raises(ValueError, match="overlap"):
            xs.unstack(x, z={"b": 2, "q": 4})


class TestTransposeGrids:
    @pytest.mark.parametrize("order", list(itertools.permutations(DIMS)))
    def test_all_orders(self, order):
        x = _x()
        xv = _v()
        out = xs.transpose(x, *order)
        assert out.type.dims == order
        np.testing.assert_array_equal(
            _run(out, x, xv),
            np.transpose(xv, [DIMS.index(d) for d in order]))

    @pytest.mark.parametrize("spec,want", [
        ((), ("c", "b", "a")),                 # no dims = reverse
        ((...,), ("a", "b", "c")),
        (("c", ...), ("c", "a", "b")),
        ((..., "a"), ("b", "c", "a")),
        (("b", ..., "a"), ("b", "c", "a")),
    ])
    def test_ellipsis(self, spec, want):
        out = xs.transpose(_x(), *spec)
        assert out.type.dims == want

    def test_missing_dims_modes(self):
        x = _x()
        with pytest.raises(ValueError, match="not in"):
            xs.transpose(x, "nope", ...)
        with pytest.warns(UserWarning):
            out = xs.transpose(x, "nope", "c", ..., missing_dims="warn")
        assert out.type.dims == ("c", "a", "b")
        out = xs.transpose(x, "nope", "c", ..., missing_dims="ignore")
        assert out.type.dims == ("c", "a", "b")

    def test_double_ellipsis_rejected(self):
        with pytest.raises(ValueError, match="ellipsis"):
            xs.transpose(_x(), ..., "a", ...)


class TestConcatGrids:
    def test_basic_same_dims(self):
        x = xtensor("x", dims=("a", "b"), shape=(2, 3), dtype="float64")
        y = xtensor("y", dims=("a", "b"), shape=(4, 3), dtype="float64")
        out = xs.concat([x, y], dim="a")
        assert out.type.dims == ("a", "b")
        assert out.type.shape == (6, 3)

    def test_operand_missing_concat_dim_is_one_slice(self):
        x = xtensor("x", dims=("a", "b"), shape=(2, 3), dtype="float64")
        y = xtensor("y", dims=("b",), shape=(3,), dtype="float64")
        out = xs.concat([x, y], dim="a")
        assert out.type.shape == (3, 3)
        f = ptt.function([x, y], out.values)
        xv = np.arange(6.).reshape(2, 3)
        yv = np.array([9., 8., 7.])
        np.testing.assert_array_equal(
            f(xv, yv), np.concatenate([xv, yv[None]], 0))

    def test_new_dim_stacks_first(self):
        x = xtensor("x", dims=("a", "b"), shape=(2, 3), dtype="float64")
        y = xtensor("y", dims=("a", "b"), shape=(2, 3), dtype="float64")
        out = xs.concat([x, y], dim="new")
        assert out.type.dims == ("new", "a", "b")
        assert out.type.shape == (2, 2, 3)
        f = ptt.function([x, y], out.values)
        xv = np.arange(6.).reshape(2, 3)
        np.testing.assert_array_equal(
            f(xv, xv + 10), np.stack([xv, xv + 10]))

    def test_transposed_operands_align(self):
        x = xtensor("x", dims=("a", "b"), shape=(2, 3), dtype="float64")
        y = xtensor("y", dims=("b", "a"), shape=(3, 2), dtype="float64")
        out = xs.concat([x, y], dim="a")
        assert out.type.dims == ("a", "b")
        f = ptt.function([x, y], out.values)
        xv = np.arange(6.).reshape(2, 3)
        yv = np.arange(6.).reshape(3, 2) + 50
        np.testing.assert_array_equal(
            f(xv, yv), np.concatenate([xv, yv.T], 0))

    def test_dtype_upcast(self):
        x = xtensor("x", dims=("a",), shape=(2,), dtype="int32")
        y = xtensor("y", dims=("a",), shape=(2,), dtype="float64")
        assert xs.concat([x, y], dim="a").type.dtype == "float64"

    def test_conflicting_batch_sizes_rejected(self):
        x = xtensor("x", dims=("a", "b"), shape=(2, 3), dtype="float64")
        y = xtensor("y", dims=("a", "b"), shape=(2, 4), dtype="float64")
        with pytest.raises(ValueError, match="conflicting"):
            xs.concat([x, y], dim="a")


class TestSharedAndConstant:
    def test_xtensor_shared_in_graph_with_updates(self):
        from pytensor_tpu.xtensor.type import xtensor_shared

        s = xtensor_shared(np.zeros((2, 3), "float64"), dims=("r", "c"))
        f = ptt.function([], xr.sum(s, "c").values,
                         updates=[(s, s + 1.0)])
        np.testing.assert_array_equal(f(), [0.0, 0.0])
        np.testing.assert_array_equal(f(), [3.0, 3.0])
        np.testing.assert_array_equal(s.get_value(), np.full((2, 3), 2.0))

    def test_xtensor_constant(self):
        from pytensor_tpu.xtensor.type import xtensor_constant

        c = xtensor_constant(np.arange(6).reshape(2, 3), dims=("a", "b"))
        assert c.type.dims == ("a", "b")
        with pytest.raises(TypeError, match="dims"):
            xtensor_constant(np.arange(6).reshape(2, 3))
        with pytest.raises(TypeError, match="ndim"):
            xtensor_constant(np.arange(6), dims=("a", "b"))
