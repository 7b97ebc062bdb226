"""Build the native library: ``python rt_rs_tpu/native/build.py``.

Produces ``librt_native.so`` next to this file.  The package works
without it (NumPy fallbacks); the native path matters for large scenes
where the Python recursive builder is slow.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent
SRC = HERE / "rt_native.cpp"
OUT = HERE / "librt_native.so"


def build(verbose: bool = True) -> pathlib.Path:
    cmd = [
        "g++", "-O2", "-march=native", "-shared", "-fPIC", "-std=c++17",
        # f32 semantics must match NumPy/Rust exactly: no FMA contraction,
        # no fast-math reassociation.
        "-ffp-contract=off", "-fno-fast-math",
        str(SRC), "-o", str(OUT),
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
    sys.exit(0)
