"""Elemwise fusion region.

Parallels /root/reference/pytensor/tensor/rewriting/elemwise.py
(FusionOptimizer:570) and fused_elemwise.py (FusedElemwise:107).  On TPU
the XLA compiler fuses elementwise chains automatically, so the graph-
level fusion pass exists for (a) optional Pallas kernel emission
(config.pallas__fusion) and (b) keeping graph sizes small.  The actual
FusedElemwise op lives in pytensor_tpu.tensor.fused (round-1: identity
placeholder pass; Pallas emitter wired in link/pallas)."""

from __future__ import annotations

# The fusion SequenceDB region is created in compile/mode.py (fusedb).
# Fusion rewrites are registered here as they land.
