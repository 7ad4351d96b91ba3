"""Build the mapfree_native C extension in-place.

Run: python native/build.py
Produces mapfree_native.*.so at the repo root (importable from the repo cwd).
"""

import subprocess
import sys
import sysconfig
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent


def main():
    src = ROOT / "native" / "decoder.cpp"
    ext_suffix = sysconfig.get_config_var("EXT_SUFFIX")
    out = ROOT / f"mapfree_native{ext_suffix}"
    include_py = sysconfig.get_paths()["include"]
    include_np = np.get_include()

    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        f"-I{include_py}", f"-I{include_np}",
        str(src), "-ljpeg", "-o", str(out),
    ]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    print(f"built {out}")


if __name__ == "__main__":
    main()
