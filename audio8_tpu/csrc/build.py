"""Build the native library: g++ -> libaudio8.so (plain C ABI, ctypes).

Run: python -m audio8_tpu.csrc.build
"""
from __future__ import annotations

import os
import subprocess
import sys

SRC = ["editdistance.cc", "beam.cc", "flac.cc", "arpa_lm.cc", "kenlm_bin.cc"]
HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "libaudio8.so")


def build(verbose: bool = True) -> str:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        *(os.path.join(HERE, s) for s in SRC),
        "-o", OUT,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
    sys.exit(0)
