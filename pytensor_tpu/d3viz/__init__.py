from pytensor_tpu.d3viz.d3viz import d3viz, d3write
