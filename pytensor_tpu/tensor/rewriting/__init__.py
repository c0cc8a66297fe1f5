"""Tensor rewrite packs — registered into the global optdb on import.

Parallels /root/reference/pytensor/tensor/rewriting/ (17.7k LoC across
basic/math/elemwise/shape/subtensor/blas/linalg packs).
"""

import pytensor_tpu.tensor.rewriting.basic  # noqa: F401
import pytensor_tpu.tensor.rewriting.math  # noqa: F401
import pytensor_tpu.tensor.rewriting.elemwise  # noqa: F401
import pytensor_tpu.tensor.rewriting.shape  # noqa: F401
import pytensor_tpu.tensor.rewriting.subtensor  # noqa: F401
import pytensor_tpu.tensor.rewriting.linalg  # noqa: F401
import pytensor_tpu.tensor.rewriting.special  # noqa: F401
import pytensor_tpu.tensor.rewriting.blockwise  # noqa: F401
