from pytensor_tpu.link.xla.linker import XlaLinker
from pytensor_tpu.link.xla.dispatch import xla_funcify
