"""Native host runtime.

The TPU compute path is XLA; this package holds the native C pieces of
the *host* runtime, mirroring the reference's native inventory
(SURVEY §2.4): a C thunk-loop VM (the lazylinker_c.c role — drives the
oracle thunks and clears dead storage cells without interpreter
overhead) plus the on-disk build cache with file locking
(compilelock parity).
"""

from pytensor_tpu.link.c.build import get_hostvm
