r"""Build integration for the native host library.

``python setup.py build_native`` (or plain ``make native``) compiles
``bblean_tpu/csrc/bblean_native.cpp`` into
``bblean_tpu/csrc/build/libbblean_native.so``, loaded at runtime through
ctypes (no pybind11 dependency).  The package is fully functional without it;
the library accelerates the exact host engine ~4x over the Python engine.

Env knobs (mirroring the reference's build flags):
- ``BBLEAN_TPU_BUILD_NATIVE=0`` skips the native build during ``build``.
- ``BBLEAN_TPU_CUSTOM_FLAGS`` overrides the optimization flags.
"""

import os
import subprocess
import sys
from pathlib import Path

from setuptools import Command, setup
from setuptools.command.build_py import build_py

ROOT = Path(__file__).parent
SRC = ROOT / "bblean_tpu" / "csrc" / "bblean_native.cpp"
OUT = ROOT / "bblean_tpu" / "csrc" / "build" / "libbblean_native.so"

# Portable baseline; AVX-512 fast paths use per-function target attributes
# with runtime __builtin_cpu_supports dispatch (see csrc/bblean_native.cpp)
DEFAULT_FLAGS = ["-O3", "-std=c++17", "-fPIC", "-shared", "-march=x86-64-v2",
                 "-funroll-loops"]


def _compile_native() -> bool:
    flags = os.environ.get("BBLEAN_TPU_CUSTOM_FLAGS")
    flags = flags.split() if flags else DEFAULT_FLAGS
    OUT.parent.mkdir(parents=True, exist_ok=True)
    cmd = [os.environ.get("CXX", "g++"), *flags, "-o", str(OUT), str(SRC)]
    print(" ".join(cmd))
    try:
        subprocess.run(cmd, check=True)
        return True
    except (OSError, subprocess.CalledProcessError) as e:
        print(f"native build failed ({e}); continuing without it",
              file=sys.stderr)
        return False


class BuildNative(Command):
    description = "compile the native (C++) host library"
    user_options: list = []

    def initialize_options(self) -> None:
        pass

    def finalize_options(self) -> None:
        pass

    def run(self) -> None:
        _compile_native()


class BuildPyWithNative(build_py):
    def run(self) -> None:
        if os.environ.get("BBLEAN_TPU_BUILD_NATIVE", "1") != "0":
            _compile_native()
        super().run()


setup(cmdclass={"build_native": BuildNative, "build_py": BuildPyWithNative})
