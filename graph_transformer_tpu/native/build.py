"""Build the native extensions with g++ (no pybind11 — C ABI + ctypes).

Usage: python -m graph_transformer_tpu.native.build
The wrappers also attempt this build lazily on first use.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

TARGETS = {
    "log_uniform": ("log_uniform.cpp", "liblog_uniform.so"),
    "batcher": ("batcher.cpp", "libbatcher.so"),
}


def build(name: str, verbose: bool = True) -> str:
    src, out = TARGETS[name]
    src_path = os.path.join(HERE, src)
    out_path = os.path.join(HERE, out)
    if not os.path.exists(src_path):
        raise FileNotFoundError(src_path)
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        src_path, "-o", out_path,
    ]
    if verbose:
        print("+", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=not verbose)
    return out_path


def ensure(name: str) -> str:
    """Return the .so path, building it if missing or stale."""
    src, out = TARGETS[name]
    src_path = os.path.join(HERE, src)
    out_path = os.path.join(HERE, out)
    if (
        not os.path.exists(out_path)
        or os.path.getmtime(out_path) < os.path.getmtime(src_path)
    ):
        build(name, verbose=False)
    return out_path


def main():
    for name, (src, _) in TARGETS.items():
        if os.path.exists(os.path.join(HERE, src)):
            path = build(name)
            print(f"built {path}")


if __name__ == "__main__":
    sys.exit(main())
