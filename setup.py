"""Build the native I/O extension: python setup.py build_ext --inplace."""

from setuptools import Extension, setup

setup(
    name="vvc-mip-gpu-tpu",
    version="0.1.0",
    packages=["vvc_mip_gpu_tpu"],
    ext_modules=[
        Extension(
            "vvc_mip_gpu_tpu.io._native_ext",
            sources=["native/io_ext.c"],
            extra_compile_args=["-O3"],
        ),
    ],
)
