from pytensor_tpu.compile.debug.debugmode import (BadOptimization, BadThunkOutput, DebugMode)
from pytensor_tpu.compile.debug.nanguardmode import NanGuardMode
from pytensor_tpu.compile.debug.monitormode import MonitorMode, detect_nan
from pytensor_tpu.compile.debug.profiling import ProfileStats
