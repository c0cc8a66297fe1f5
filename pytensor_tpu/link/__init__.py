"""Link layer: turn a rewritten FunctionGraph into an executable.

TPU-first layout (SURVEY §7): one XLA linker (link/xla) is the production
backend — the whole graph lowers to a single jitted XLA executable with
donated shared buffers; the numpy PerformLinker (link/basic) is the
testing oracle, mirroring the reference's backend-parity strategy
(tests/link/jax/test_basic.py:36 ``compare_jax_and_py``).
"""

from pytensor_tpu.link.basic import Container, Linker, PerformLinker
