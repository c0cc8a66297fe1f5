from pytensor_tpu.scan.basic import scan, until
from pytensor_tpu.scan.checkpoints import scan_checkpoints
from pytensor_tpu.scan.views import foldl, foldr, map, reduce
import pytensor_tpu.scan.rewriting  # noqa: F401  (registers scan passes)
import pytensor_tpu.scan.dynlen  # noqa: F401  (while-scan executed-prefix)
