"""Build glue for the gen3c_native CPython extension.

Static metadata lives in pyproject.toml; this file only declares the
compiled extension (the pyngp-parity Python bindings over the native
cores — see gen3c_tpu/native/gen3c_native.cpp). The extension is
OPTIONAL at runtime: gen3c_tpu.native.ext also builds it on demand with
g++, and the ctypes layer remains the dependency-free fallback, so a
pure-Python install (pip install --no-build-isolation, or environments
without a C++ toolchain) still works in full.
"""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """Don't fail the whole install when the toolchain is absent."""

    def run(self):
        try:
            super().run()
        except Exception as e:  # noqa: BLE001
            print(f"gen3c_native build skipped ({e}); ctypes fallback only")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:  # noqa: BLE001
            print(f"gen3c_native build skipped ({e}); ctypes fallback only")


setup(
    ext_modules=[
        Extension(
            "gen3c_tpu.native.gen3c_native",
            sources=["gen3c_tpu/native/gen3c_native.cpp"],
            extra_compile_args=["-O2", "-std=c++17"],
            optional=True,
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
