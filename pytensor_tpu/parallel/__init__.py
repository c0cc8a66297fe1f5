"""Multi-chip execution: mesh-sharded compiled functions.

The reference is single-device (SURVEY §5.8: no distributed runtime
exists to mirror).  This module is the TPU-native extension: compiled
functions run SPMD over a ``jax.sharding.Mesh`` — inputs/shared state
carry PartitionSpecs, XLA/GSPMD inserts the collectives, updates stay
donated on device.  Scaling recipe: pick a mesh, annotate shardings, let
XLA insert collectives (data-parallel batch sharding by default; tensor
parallelism by shard-annotating parameter dims).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from pytensor_tpu.compile.mode import Mode
from pytensor_tpu.graph.basic import Variable
from pytensor_tpu.link.xla.linker import XlaLinker


def make_mesh(axis_shapes: dict | None = None, devices=None):
    """Create a Mesh, e.g. make_mesh({"data": 4, "model": 2})."""
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    if axis_shapes is None:
        axis_shapes = {"data": len(devices)}
    names = tuple(axis_shapes)
    shape = tuple(axis_shapes[n] for n in names)
    n_needed = int(np.prod(shape))
    if n_needed > len(devices):
        raise ValueError(f"mesh needs {n_needed} devices, have {len(devices)}")
    dev_array = np.array(devices[:n_needed]).reshape(shape)
    return Mesh(dev_array, names)


def spec(*axes):
    """PartitionSpec shorthand: spec('data', None) etc."""
    from jax.sharding import PartitionSpec

    return PartitionSpec(*axes)


class _ShardedLinker(XlaLinker):
    """XlaLinker resolving per-variable PartitionSpecs at link time."""

    def __init__(self, mesh, shardings_by_var=None, out_specs=None, **kwargs):
        super().__init__(**kwargs)
        self.mesh = mesh
        self.shardings_by_var = shardings_by_var or {}
        self.out_specs = out_specs

    def resolve_in_shardings(self, ordered_vars: Sequence[Variable]):
        from jax.sharding import NamedSharding, PartitionSpec

        res = []
        for v in ordered_vars:
            s = self.shardings_by_var.get(v)
            res.append(
                NamedSharding(self.mesh, s if s is not None else PartitionSpec())
            )
        self.in_shardings = tuple(res)
        if self.out_specs is not None:
            from jax.sharding import NamedSharding

            self.out_shardings = tuple(
                NamedSharding(self.mesh, s) for s in self.out_specs
            )


def function(inputs, outputs=None, updates=None, *, mesh, input_specs=None,
             shared_specs=None, output_specs=None, **kwargs):
    """Compile a mesh-sharded function.

    input_specs: list of PartitionSpec (or None) per explicit input.
    shared_specs: {shared_var: PartitionSpec} for sharded parameters/state.
    output_specs: optional list of PartitionSpec per (output + update).
    """
    from pytensor_tpu.compile.maker import function as base_function

    shardings = {}
    if input_specs is not None:
        for v, s in zip(inputs, input_specs):
            if s is not None:
                shardings[v] = s
    if shared_specs:
        shardings.update(shared_specs)
    linker = _ShardedLinker(mesh, shardings, output_specs)
    mode = Mode(linker, "fast_run")
    fn = base_function(inputs, outputs, updates=updates, mode=mode, **kwargs)
    return fn


def device_put_sharded_value(value, mesh, pspec):
    """Place a host array on the mesh with the given PartitionSpec."""
    import jax
    from jax.sharding import NamedSharding

    return jax.device_put(value, NamedSharding(mesh, pspec))


def shard_shared(shared_var, mesh, pspec):
    """Move a shared variable's value onto the mesh with a sharding."""
    val = shared_var.container.storage[0]
    shared_var.container.storage[0] = device_put_sharded_value(val, mesh, pspec)
    return shared_var
