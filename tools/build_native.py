"""Build the native C++ components (batched MuJoCo oracle stepper).

    python tools/build_native.py

Produces native/libmjbatch.so, linked against the mujoco wheel's
libmujoco.so (rpath'd so no environment variables are needed at load time).
"""

import os
import subprocess
import sys


def mujoco_paths():
    import mujoco

    pkg = os.path.dirname(mujoco.__file__)
    include = os.path.join(pkg, "include")
    libname = None
    for f in os.listdir(pkg):
        if f.startswith("libmujoco.so"):
            libname = f
    assert libname, f"no libmujoco in {pkg}"
    return pkg, include, libname


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    native = os.path.join(here, "..", "native")
    src = os.path.join(native, "mujoco_batch.cpp")
    out = os.path.join(native, "libmjbatch.so")
    pkg, include, libname = mujoco_paths()
    # The wheel ships libmujoco.so.X.Y.Z without a plain .so symlink; link
    # by explicit path with -l: syntax.
    cmd = [
        "g++", "-O2", "-fPIC", "-shared", "-std=c++17", "-pthread",
        f"-I{include}",
        src,
        f"-L{pkg}", f"-l:{libname}",
        f"-Wl,-rpath,{pkg}",
        "-o", out,
    ]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    print("built", out)


if __name__ == "__main__":
    main()
