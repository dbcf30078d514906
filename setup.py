"""Build the native runtime extensions.

    python setup.py build_ext --inplace

places ``mdqtplasmasims_tpu/io/_datio_native*.so``; all native components
are optional — pure-Python fallbacks are always available.
"""

from setuptools import Extension, setup

setup(
    name="mdqtplasmasims_tpu",
    version="0.1.0",
    packages=["mdqtplasmasims_tpu"],
    ext_modules=[
        Extension(
            "mdqtplasmasims_tpu.io._datio_native",
            sources=["native/datio.c"],
            extra_compile_args=["-O3"],
        ),
    ],
)
