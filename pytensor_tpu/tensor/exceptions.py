"""Tensor exceptions (reference tensor/exceptions.py)."""

from pytensor_tpu.tensor.basic import NotScalarConstantError  # noqa: F401


class ShapeError(Exception):
    """A shape-related error during graph construction or inference."""


class AdvancedIndexingError(Exception):
    """Malformed advanced-indexing pattern."""
