"""Build driver for the native runtime (libshred_native.so).

Builds on demand with g++ and caches the shared library next to the
sources, keyed by a content hash of the C++ sources so edits trigger a
rebuild.  No external build system needed (the reference used
scikit-build-core + CMake; a ~50-line driver is enough here and keeps the
wheel-less, source-checkout workflow zero-config).
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import tempfile

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
CSRC_DIR = os.path.join(_THIS_DIR, "csrc")
SOURCES = ["corpus.cpp", "faithful.cpp", "encode.cpp", "unigram.cpp",
           "pretok.cpp", "dedup.cpp", "api.cpp"]
HEADERS = ["shred_native.hpp"]

CXX = os.environ.get("SHRED_CXX", "g++")
CXXFLAGS = [
    "-O3",
    "-std=c++17",
    "-fPIC",
    "-shared",
    "-pthread",
    "-march=native",
    "-Wall",
]

# SHRED_SANITIZE=address|thread|undefined builds the runtime under the
# matching sanitizer (the loader is threaded; the reference had no
# sanitizer config at all, SURVEY.md §5).  The hash keys the flags, so
# sanitized and plain builds coexist.
_SAN = os.environ.get("SHRED_SANITIZE", "")
if _SAN:
    CXXFLAGS += [f"-fsanitize={_SAN}", "-fno-omit-frame-pointer", "-g"]


def _source_hash() -> str:
    h = hashlib.sha256()
    for name in HEADERS + SOURCES:
        with open(os.path.join(CSRC_DIR, name), "rb") as f:
            h.update(f.read())
    h.update(" ".join([CXX] + CXXFLAGS).encode())
    return h.hexdigest()[:16]


def _out_dir() -> str:
    """Directory for the built library: next to the sources when
    writable (source checkout, user pip install); otherwise a per-user
    cache dir (system installs with a read-only site-packages)."""
    if os.access(_THIS_DIR, os.W_OK):
        return _THIS_DIR
    cache = os.environ.get("SHRED_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "shredword_tpu")
    os.makedirs(cache, exist_ok=True)
    return cache


def lib_path() -> str:
    name = f"libshred_native-{_source_hash()}.so"
    here = os.path.join(_THIS_DIR, name)
    if os.path.exists(here):    # wheel-built or previously built in-tree
        return here
    return os.path.join(_out_dir(), name)


def build(verbose: bool = False) -> str:
    """Build (if needed) and return the path to the shared library."""
    out = lib_path()
    if os.path.exists(out):
        return out
    out_dir = os.path.dirname(out)
    srcs = [os.path.join(CSRC_DIR, s) for s in SOURCES]
    # build to a temp file then rename: atomic under concurrent builders
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=out_dir)
    os.close(fd)
    cmd = [CXX, *CXXFLAGS, "-o", tmp, *srcs]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise RuntimeError(
                f"native build failed:\n{' '.join(cmd)}\n{proc.stderr}"
            )
        os.replace(tmp, out)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    if verbose:
        print(f"[shredword_tpu] built native runtime: {out}")
    # clean stale builds
    for name in os.listdir(out_dir):
        if name.startswith("libshred_native-") and name.endswith(".so"):
            if os.path.join(out_dir, name) != out:
                try:
                    os.unlink(os.path.join(out_dir, name))
                except OSError:
                    pass
    return out


if __name__ == "__main__":
    print(build(verbose=True))
