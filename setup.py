"""Build the native runtime extensions.

    python setup.py build_ext --inplace

places ``mdqtplasmasims_tpu/io/_datio_native*.so``; all native components
are optional — pure-Python fallbacks are always available.  Project
metadata lives in pyproject.toml; this file only declares the C
extension (PEP 621 has no ext_modules table).
"""

from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "mdqtplasmasims_tpu.io._datio_native",
            sources=["native/datio.c"],
            extra_compile_args=["-O3"],
            optional=True,
        ),
    ],
)
