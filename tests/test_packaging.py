"""Packaging (pyproject.toml + setup.py): the framework must be
installable as a real distribution, with the C++ JPEG decoder pre-built
into the package tree when a toolchain exists (setup.py build_py hook)
and shipped as source otherwise (build-on-demand / PIL fallback at
runtime — tpucap/ops/jpeg/__init__.py)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyproject_version_matches_package():
    import tomllib

    import tpucap.version

    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    assert meta["project"]["name"] == "tpucap"
    assert (
        meta["tool"]["setuptools"]["dynamic"]["version"]["attr"]
        == "tpucap.version.__version__"
    )
    assert tpucap.version.__version__


@pytest.mark.slow
def test_setup_build_produces_importable_tree(tmp_path):
    build_lib = str(tmp_path / "build")
    r = subprocess.run(
        [sys.executable, "setup.py", "build", "--build-lib", build_lib],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr
    jpeg_dir = os.path.join(build_lib, "tpucap", "ops", "jpeg")
    assert os.path.exists(os.path.join(jpeg_dir, "jpeg_decode.cpp"))
    # With the in-image toolchain the decoder pre-builds; elsewhere the
    # build must still have succeeded (runtime falls back).
    prebuilt = os.path.exists(os.path.join(jpeg_dir, "_jpeg_decode.so"))
    probe = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, sys.argv[1]);"
            "import tpucap, tpucap.version;"
            "assert tpucap.__file__.startswith(sys.argv[1]);"
            "print(tpucap.version.__version__)",
            build_lib,
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert probe.returncode == 0, probe.stderr
    assert probe.stdout.strip(), "version import failed"
    if not prebuilt:
        pytest.skip("no g++/libjpeg at build time — source-only tree OK")
