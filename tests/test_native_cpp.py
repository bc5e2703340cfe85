"""Builds and runs the C++ test binary (tests/csrc/native_test.cpp) —
the counterpart of the reference's standalone bpe_test.cpp tier
(SURVEY.md §4), driving the native runtime without Python."""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CSRC = os.path.join(REPO, "shredword_tpu", "runtime", "csrc")


@pytest.fixture(scope="module")
def binary(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cxx") / "native_test")
    srcs = [os.path.join(REPO, "tests", "csrc", "native_test.cpp")] + [
        os.path.join(CSRC, f)
        for f in ("corpus.cpp", "faithful.cpp", "encode.cpp",
                  "unigram.cpp", "api.cpp")
    ]
    r = subprocess.run(
        ["g++", "-O2", "-std=c++17", "-pthread", "-o", out, *srcs,
         "-I", CSRC],
        capture_output=True, text=True)
    assert r.returncode == 0, f"C++ test build failed:\n{r.stderr}"
    return out


def test_cpp_suite_passes(binary):
    r = subprocess.run([binary], capture_output=True, text=True,
                       timeout=120)
    assert r.returncode == 0, f"C++ tests failed:\n{r.stdout}\n{r.stderr}"
    assert "8/8 tests passed" in r.stdout
