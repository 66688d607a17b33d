"""Build shim: compiles the native frame-IO runtime into the wheel.

native/frameio.cc is a plain C++ shared library (PNG codec + thread-pool
RGBD batch loader) loaded via ctypes, not a CPython extension module — but
setuptools' Extension machinery is still the portable way to compile it at
install time. The resulting recon3d_tpu/libframeio*.so is discovered by
recon3d_tpu.utils.native.load_library(); the extension is marked optional
so environments without a C++ toolchain (or zlib headers) install cleanly
and fall back to the pure-Python PIL codecs.
"""
from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "recon3d_tpu.libframeio",
            sources=["native/frameio.cc"],
            language="c++",
            libraries=["z"],
            extra_compile_args=["-O3", "-std=c++17"],
            optional=True,
        )
    ],
)
