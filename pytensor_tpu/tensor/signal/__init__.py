from pytensor_tpu.tensor.signal.conv import convolve1d, convolve2d
