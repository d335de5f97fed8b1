"""Builds the optional native host library alongside the package.

The framework is pure Python + JAX; csrc/pgdrome_native.cpp provides
optional accelerated host kernels (assembly scatter, Thomas solve, FD
builders) loaded via ctypes with automatic numpy fallbacks.
"""

import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        src = Path(__file__).parent / "csrc" / "pgdrome_native.cpp"
        out = Path(__file__).parent / "pgdrome_tpu" / "_libpgdrome_native.so"
        if src.exists():
            try:
                subprocess.run(
                    ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                     "-o", str(out), str(src)],
                    check=True,
                )
            except Exception as e:  # pure-python install still works
                print(f"native build skipped: {e}", file=sys.stderr)
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
