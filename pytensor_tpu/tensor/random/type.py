"""RNG state as a graph value.

Parallels /root/reference/pytensor/tensor/random/type.py
(RandomGeneratorType:103) with the TPU-native design from SURVEY §7: the
RNG value is a counter-based PRNG key (jax threefry), so
``(rng, size, *params) -> (next_rng, draws)`` maps onto key splitting and
the whole sampling graph stays on device.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.graph.type import Type


class RandomGeneratorType(Type):
    """Type of PRNG-key values (uint32[2] threefry keys)."""

    __props__ = ()

    def filter(self, data, strict=False, allow_downcast=None):
        import jax

        if isinstance(data, (int, np.integer)):
            return np.asarray(jax.random.PRNGKey(int(data)))
        if isinstance(data, np.random.Generator):
            # interop: derive a key from a numpy Generator's bit stream
            seed = int(data.integers(0, 2**31 - 1))
            return np.asarray(jax.random.PRNGKey(seed))
        arr = np.asarray(data)
        if arr.dtype == np.uint32 and arr.shape == (2,):
            return arr
        try:
            import jax

            if isinstance(data, jax.Array) and data.shape == (2,):
                return data
        except ImportError:
            pass
        raise TypeError(f"Cannot interpret {type(data)} as a PRNG key")

    def values_eq(self, a, b):
        return bool(np.array_equal(np.asarray(a), np.asarray(b)))

    def make_constant_signature(self, data):
        return np.asarray(data).tobytes()

    def __str__(self):
        return "RandomGeneratorType"


random_generator_type = RandomGeneratorType()
RandomType = RandomGeneratorType


class TensorFromKey(_OpBase := __import__(
        "pytensor_tpu.graph.op", fromlist=["Op"]).Op):
    """RNG key -> uint32[2] tensor (identity at lowering; lets Scan trace
    per-step keys for gradient replay)."""

    __props__ = ()

    def make_node(self, rng):
        from pytensor_tpu.graph.basic import Apply
        from pytensor_tpu.tensor.type import TensorType

        if not isinstance(rng.type, RandomGeneratorType):
            raise TypeError("expected an RNG variable")
        return Apply(self, [rng], [TensorType("uint32", (2,))()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = np.asarray(inputs[0], dtype=np.uint32)

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu.gradient import grad_undefined

        return [grad_undefined(self, 0, inputs[0], "RNG key")]


class KeyFromTensor(_OpBase):
    """uint32[2] tensor -> RNG key (inverse of TensorFromKey)."""

    __props__ = ()

    def make_node(self, t):
        from pytensor_tpu.graph.basic import Apply
        from pytensor_tpu.tensor.basic import as_tensor_variable

        t = as_tensor_variable(t)
        return Apply(self, [t], [random_generator_type()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = np.asarray(inputs[0], dtype=np.uint32)

    def L_op(self, inputs, outputs, output_grads):
        from pytensor_tpu.gradient import grad_undefined

        return [grad_undefined(self, 0, inputs[0], "RNG key")]


tensor_from_key = TensorFromKey()
key_from_tensor = KeyFromTensor()


def _register_key_xla():
    from pytensor_tpu.link.xla.dispatch import xla_funcify

    @xla_funcify.register(TensorFromKey)
    @xla_funcify.register(KeyFromTensor)
    def _key_identity(op, node=None, **kw):
        import jax.numpy as jnp

        return lambda x: jnp.asarray(x, dtype=jnp.uint32)


_register_key_xla()
