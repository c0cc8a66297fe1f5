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
