"""Device transfer ops (reference tensor/transfer.py).

The reference moves data between backends; on this framework there is
one accelerator namespace, so ``transfer`` is jax.device_put behind the
graph boundary.
"""

from __future__ import annotations


def transfer(var, target=None):
    """Return ``var`` unchanged at graph level: placement is decided by
    the XLA linker (shardings/donation), not per-op transfers."""
    from pytensor_tpu.tensor.basic import as_tensor_variable

    return as_tensor_variable(var)
