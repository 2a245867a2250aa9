"""Build the native chainio library: ``python -m ptmcmcsampler_tpu.io.build_native``."""

from __future__ import annotations

import os
import subprocess
import sys


def build(verbose=True):
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    csrc = os.path.join(root, "csrc")
    src = os.path.join(csrc, "chainio.cpp")
    out = os.path.join(csrc, "libchainio.so")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", out, src]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
    except (subprocess.CalledProcessError, FileNotFoundError) as err:
        if verbose:
            print(f"native chainio build failed ({err}); numpy fallback will be used")
        return None
    return out


if __name__ == "__main__":
    path = build()
    sys.exit(0 if path else 1)
