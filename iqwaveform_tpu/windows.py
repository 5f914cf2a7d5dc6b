"""Reference-compatible facade for windows (reference windows.py).
Implementations live in iqwaveform_tpu.ops.windows."""

from .ops.windows import (  # noqa: F401
    acg,
    cosh,
    knab,
    modified_bessel,
    register_extra_windows,
)
from .utils import lazy_import  # noqa: F401  (reference windows.py import surface)
