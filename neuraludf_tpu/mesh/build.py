"""Build the native marching-cubes extension (g++ -> shared object).

Compiled lazily on first use and cached next to the source; rebuilt when
the source is newer than the binary.
"""

from __future__ import annotations

import os
import subprocess

CSRC = os.path.join(os.path.dirname(__file__), "csrc", "udf_mc.cpp")
LIB = os.path.join(os.path.dirname(__file__), "csrc", "libudf_mc.so")


def ensure_built() -> str:
    if os.path.exists(LIB) and os.path.getmtime(LIB) >= os.path.getmtime(CSRC):
        return LIB
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        CSRC, "-o", LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return LIB
