"""Build the native host components (g++ -O3 shared libs, loaded via
ctypes).  Idempotent: rebuilds only when sources are newer."""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
LIBS = {
    "bpe": ["bpe.cpp"],
    "audio": ["audio.cpp"],
}


def lib_path(name: str) -> str:
    return os.path.join(HERE, f"lib{name}.so")


def build(name: str, force: bool = False) -> str:
    out = lib_path(name)
    srcs = [os.path.join(HERE, s) for s in LIBS[name]]
    if not force and os.path.exists(out):
        if all(os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs):
            return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", out, *srcs]
    subprocess.check_call(cmd)
    return out


def build_all(force: bool = False) -> None:
    for name in LIBS:
        print(f"building lib{name}.so ...")
        build(name, force)


if __name__ == "__main__":
    build_all(force="--force" in sys.argv)
