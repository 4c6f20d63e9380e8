"""Build the native marching-cubes extension (g++ -> shared object).

Compiled lazily on first use and cached next to the source; rebuilt when
the source is newer than the binary.
"""

from __future__ import annotations

import os
import subprocess

_D = os.path.join(os.path.dirname(__file__), "csrc")
CSRC = [os.path.join(_D, "udf_mc.cpp"), os.path.join(_D, "lewiner.cpp")]
HDRS = [os.path.join(_D, "lewiner.h"), os.path.join(_D, "lewiner_luts.h")]
LIB = os.path.join(_D, "libudf_mc.so")


def ensure_built() -> str:
    srcs = CSRC + HDRS
    if os.path.exists(LIB) and all(
        os.path.getmtime(LIB) >= os.path.getmtime(s) for s in srcs
    ):
        return LIB
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        *CSRC, "-o", LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return LIB
