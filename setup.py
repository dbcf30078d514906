"""Build the native runtime extensions.

    python setup.py build_ext --inplace

places ``mdqtplasmasims_tpu/io/_datio_native*.so``; all native components
are optional — pure-Python fallbacks are always available.
"""

from setuptools import Extension, find_packages, setup

setup(
    name="mdqtplasmasims_tpu",
    version="0.1.0",
    packages=find_packages(include=["mdqtplasmasims_tpu",
                                    "mdqtplasmasims_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["jax", "numpy"],
    ext_modules=[
        Extension(
            "mdqtplasmasims_tpu.io._datio_native",
            sources=["native/datio.c"],
            extra_compile_args=["-O3"],
        ),
    ],
)
