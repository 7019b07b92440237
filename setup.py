"""Build hooks for the tpucap package (metadata lives in pyproject.toml).

The only native artifact is the threaded libjpeg batch decoder
(tpucap/ops/jpeg/jpeg_decode.cpp). It is deliberately NOT a CPython
extension module — it exports a plain C symbol loaded via ctypes
(tpucap/ops/jpeg/__init__.py), so it has no Python ABI tag and one build
serves every interpreter. This hook pre-builds it into the package tree
at `build_py` time when g++ + libjpeg are available; when they are not,
the build still succeeds and the runtime falls back to build-on-demand
at first import (or the PIL decode path on toolchain-less hosts).
"""

import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py


class build_py_with_jpeg(build_py):
    def run(self):
        super().run()
        import os

        src = os.path.join(
            self.build_lib, "tpucap", "ops", "jpeg", "jpeg_decode.cpp"
        )
        out = os.path.join(
            self.build_lib, "tpucap", "ops", "jpeg", "_jpeg_decode.so"
        )
        if not os.path.exists(src):
            return
        cmd = [
            "g++",
            "-O3",
            "-shared",
            "-fPIC",
            "-std=c++17",
            src,
            "-o",
            out,
            "-ljpeg",
            "-pthread",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            print(f"built JPEG decoder extension: {out}")
        except (OSError, subprocess.CalledProcessError) as e:
            # Non-fatal by design: tpucap.ops.jpeg rebuilds on demand at
            # first import and falls back to PIL without a toolchain.
            print(
                "note: skipping JPEG decoder pre-build "
                f"({type(e).__name__}: {e}); it will build on first "
                "import or fall back to PIL",
                file=sys.stderr,
            )


setup(cmdclass={"build_py": build_py_with_jpeg})
