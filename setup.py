"""Build script: compiles the native IO extension (native/iqio.c).

The extension is optional at runtime; iqwaveform_tpu.io falls back to
numpy when it is absent.
"""

import numpy as np
from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            'iqwaveform_tpu._iqio',
            sources=['native/iqio.c'],
            include_dirs=[np.get_include()],
            extra_compile_args=['-O3', '-pthread'],
            extra_link_args=['-pthread'],
        )
    ]
)
