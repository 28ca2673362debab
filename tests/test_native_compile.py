"""The native library MUST compile when a toolchain is present.

Every other native test skips when get_lib() is None ("no g++?"), which
let a broken bits_native.cpp (template inside extern "C") ship silently:
all consumers fell back to Python and the 16 Mbp index load cost 75 s in
the round-3 bench. This test turns that silent fallback into a failure
on any machine that has g++.
"""

import shutil
import subprocess

import pytest

from finito_tpu import native


def test_native_compiles_when_toolchain_present():
    if shutil.which("g++") is None:
        pytest.skip("no g++ on this machine: Python fallback is expected")
    lib = native.get_lib()
    if lib is None:
        # reproduce the compile to surface the actual error text
        r = subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             "-pthread", *native._SRCS, "-o", "/dev/null"],
            capture_output=True, text=True,
        )
        pytest.fail(
            "g++ is available but the native library failed to build/load:\n"
            + r.stderr[-2000:]
        )
