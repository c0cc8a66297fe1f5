from pytensor_tpu.xtensor.type import XTensorType, as_xtensor, xtensor
from pytensor_tpu.xtensor import rewriting  # noqa: F401  (registers lower_xtensor)
