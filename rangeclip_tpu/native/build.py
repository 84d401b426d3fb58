"""Build the native preprocessing library with the system g++.

Usage: ``python -m rangeclip_tpu.native.build``
"""

from __future__ import annotations

import os
import subprocess


def build() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    srcs = [os.path.join(here, "preprocess.cpp"),
            os.path.join(here, "png_decode.cpp")]
    out = os.path.join(here, "libpreprocess.so")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        *srcs, "-o", out, "-lz",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


if __name__ == "__main__":
    print(build())
