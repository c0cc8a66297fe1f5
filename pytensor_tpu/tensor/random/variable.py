"""RandomGeneratorVariable sugar (reference tensor/random/variable.py)."""

from pytensor_tpu.tensor.random.type import (  # noqa: F401
    RandomGeneratorType,
    random_generator_type,
)
