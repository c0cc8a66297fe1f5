"""RandomStream and shared RNG plumbing.

Parallels /root/reference/pytensor/tensor/random/utils.py
(RandomStream:214): each sampler call creates a fresh shared PRNG-key
variable whose default_update is the op's next_rng output, so compiled
functions advance RNG state on-device via the regular update/donation
path.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.compile.sharedvalue import SharedVariable, shared_constructor
from pytensor_tpu.tensor.random.type import random_generator_type


class RandomGeneratorSharedVariable(SharedVariable):
    __slots__ = ()

    def __str__(self):
        return self.name or f"RNG({id(self.container):x})"


def rng_shared(seed_or_key, name=None):
    return RandomGeneratorSharedVariable(
        random_generator_type, random_generator_type.filter(seed_or_key), name=name
    )


@shared_constructor.register(np.random.Generator)
def _gen_shared(value, name=None, strict=False, allow_downcast=None, **kwargs):
    return rng_shared(value, name=name)


_default_counter = [0]


def default_rng_variable():
    """Fresh shared RNG used when an RV is built without an explicit rng."""
    _default_counter[0] += 1
    return rng_shared(np.random.SeedSequence(_default_counter[0]).generate_state(1)[0] & 0x7FFFFFFF)


def default_rng(seed=None):
    return rng_shared(0 if seed is None else seed)


class RandomStream:
    """Factory of seeded samplers with automatic state updates."""

    def __init__(self, seed=None, namespace=None):
        self.seed_generator = np.random.SeedSequence(seed)
        self.state_updates: list = []
        self.default_instance_seed = seed
        from pytensor_tpu.tensor import random as _random_ns

        self.namespaces = [namespace if namespace is not None else _random_ns]

    def updates(self):
        return list(self.state_updates)

    def seed(self, seed=None):
        self.seed_generator = np.random.SeedSequence(seed)
        for rng_var, _ in self.state_updates:
            (new_seed,) = self.seed_generator.spawn(1)
            rng_var.container.storage[0] = random_generator_type.filter(
                int(new_seed.generate_state(1)[0] & 0x7FFFFFFF)
            )

    def gen(self, op, *args, **kwargs):
        (seed,) = self.seed_generator.spawn(1)
        rng = rng_shared(int(seed.generate_state(1)[0] & 0x7FFFFFFF))
        rng.tag.is_rng = True
        out = op(*args, rng=rng, **kwargs)
        out.rng = rng
        next_rng = out.owner.outputs[0]
        rng.default_update = next_rng
        out.update = (rng, next_rng)
        self.state_updates.append((rng, next_rng))
        return out

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        for ns in self.namespaces:
            op = getattr(ns, name, None)
            if op is not None and callable(op):
                def sampler(*args, **kwargs):
                    return self.gen(op, *args, **kwargs)

                sampler.__name__ = name
                return sampler
        raise AttributeError(f"RandomStream has no sampler {name!r}")


def _register_xla():
    import numpy as np

    from pytensor_tpu.link.xla.dispatch import _concrete, xla_funcify
    from pytensor_tpu.tensor.random.op import RandomVariable

    @xla_funcify.register(RandomVariable)
    def _rv(op, node=None, **kw):
        import jax
        import jax.numpy as jnp

        out_dtype = node.outputs[1].type.dtype

        def sample(rng, size, *params):
            key = jnp.asarray(rng)
            if key.dtype != jnp.uint32:
                key = key.astype(jnp.uint32)
            next_key, sample_key = jax.random.split(key)
            if size is None:
                shape = None
            else:
                shape = tuple(int(s) for s in np.asarray(_concrete(size, "rv size")))
            draws = op.jax_sampler(sample_key, shape, *params)
            if str(draws.dtype) != out_dtype:
                draws = draws.astype(out_dtype)
            return next_key, draws

        return sample


_register_xla()
