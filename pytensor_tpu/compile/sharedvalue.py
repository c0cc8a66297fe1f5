"""Shared variables: graph variables with persistent values.

Parallels /root/reference/pytensor/compile/sharedvalue.py
(SharedVariable:36, shared:172, shared_constructor:219).  On the XLA path
the container holds a device array; updates are written back as donated
buffers, so optimizer/RNG state persists on-chip across calls.
"""

from __future__ import annotations

from functools import singledispatch

import numpy as np

from pytensor_tpu.config import config
from pytensor_tpu.graph.basic import Variable
from pytensor_tpu.link.basic import Container


class SharedVariable(Variable):
    """A Variable with a Container holding its current value."""

    __slots__ = ("container", "default_update")

    def __init__(self, type, value, strict=False, allow_downcast=None, name=None,
                 container=None):
        super().__init__(type, None, None, name)
        self.default_update = None
        if container is not None:
            self.container = container
        else:
            self.container = Container(
                type,
                storage=[type.filter(value, strict=strict, allow_downcast=allow_downcast)],
                strict=strict,
                allow_downcast=allow_downcast,
                name=name,
            )

    def get_value(self, borrow=False, return_internal_type=False):
        v = self.container.value
        if return_internal_type or borrow:
            return v
        if isinstance(v, np.ndarray):
            return v.copy()
        if hasattr(v, "__array__"):  # device array -> host copy
            return np.asarray(v)
        return v

    def set_value(self, new_value, borrow=False):
        self.container.value = new_value

    def zero(self, borrow=False):
        self.container.value = 0 * self.container.value

    def clone(self, **kwargs):
        cp = self.__class__(self.type, None, name=self.name, container=self.container)
        cp.tag.__update__(self.tag)
        cp.default_update = self.default_update
        return cp

    @property
    def value(self):
        raise AttributeError("use get_value/set_value")

    def __str__(self):
        return self.name or f"shared_{self.auto_name}"


@singledispatch
def shared_constructor(value, name=None, strict=False, allow_downcast=None, **kwargs):
    raise TypeError(f"No shared-variable constructor for {type(value)}")


def shared(value, name=None, strict=False, allow_downcast=None, **kwargs):
    """Create a SharedVariable whose type is inferred from ``value``."""
    try:
        return shared_constructor(value, name=name, strict=strict,
                                  allow_downcast=allow_downcast, **kwargs)
    except TypeError:
        pass
    # default: wrap as a tensor shared variable
    from pytensor_tpu.tensor.sharedvar import tensor_shared_constructor

    return tensor_shared_constructor(value, name=name, strict=strict,
                                     allow_downcast=allow_downcast, **kwargs)
