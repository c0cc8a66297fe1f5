from pytensor_tpu.tensor.random import basic  # noqa: F401
from pytensor_tpu.tensor.random.basic import *  # noqa: F401,F403
from pytensor_tpu.tensor.random.op import RandomVariable  # noqa: F401
from pytensor_tpu.tensor.random.type import (  # noqa: F401
    RandomGeneratorType,
    random_generator_type,
)
from pytensor_tpu.tensor.random.utils import RandomStream  # noqa: F401
from pytensor_tpu.tensor.random import basic, op, type, utils  # noqa: F401

default_rng = None  # set in utils


def __getattr__(name):
    if name == "default_rng":
        from pytensor_tpu.tensor.random.utils import default_rng as d

        return d
    raise AttributeError(name)


def shared_rng(seed=None, name=None):
    """Shared RNG-state constructor (reference random.shared_rng)."""
    from pytensor_tpu.tensor.random.utils import default_rng

    out = default_rng(seed)
    if name:
        out.name = name
    return out


rng = shared_rng

from pytensor_tpu.tensor.random import rewriting, variable  # noqa: F401
