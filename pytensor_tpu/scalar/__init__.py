from pytensor_tpu.scalar.basic import *  # noqa: F401,F403
from pytensor_tpu.scalar import math  # noqa: F401
from pytensor_tpu.scalar.math import *  # noqa: F401,F403
