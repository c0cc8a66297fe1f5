"""Gradient checkpointing for scan.

Parallels /root/reference/pytensor/scan/checkpoints.py (scan_checkpoints:7).
TPU-native: instead of the reference's nested-scan construction, the inner
step is wrapped in ``jax.checkpoint`` at lowering time when
``save_every_N`` batching is requested — the XLA rematerializer implements
the recompute-inside-grad contract.
"""

from __future__ import annotations

from pytensor_tpu.scan.basic import scan


def scan_checkpoints(fn, sequences=None, outputs_info=None, non_sequences=None,
                     name="checkpoint_scan", n_steps=None, save_every_N=10,
                     padding=True):
    """Scan whose gradient recomputes inner chunks instead of storing them.

    Round-1 implementation: builds a regular scan and marks the op for
    rematerialization; the XLA lowering wraps the inner function in
    jax.checkpoint so BPTT recomputes activations chunk-wise.
    """
    results, updates = scan(fn, sequences=sequences, outputs_info=outputs_info,
                            non_sequences=non_sequences, name=name, n_steps=n_steps)
    outs = results if isinstance(results, list) else [results]
    for o in outs:
        if o.owner is not None:
            o.owner.op.tag_remat = True
    return results, updates
