"""Thread-sanitizer smoke of the threaded corpus loader (the race
surface the reference never had — its loader is single threaded and it
ships no sanitizer config, SURVEY.md §5)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import numpy as np
from shredword_tpu.runtime.native import NativeCorpus
rng = np.random.RandomState(0)
words = [bytes(rng.randint(97, 123, rng.randint(2, 10)).astype('uint8'))
         for _ in range(500)]
data = b"\n".join(b" ".join(words[i] for i in rng.randint(0, 500, 40))
                  for _ in range(400))
c = NativeCorpus.from_bytes(data, nthreads=8)
arr = c.arrays()
assert arr.n_words > 100
total = int(arr.counts.sum())
c2 = NativeCorpus.from_bytes(data, nthreads=1)
arr2 = c2.arrays()
assert int(arr2.counts.sum()) == total, "threaded dedup lost words"
assert arr2.n_words == arr.n_words
print("OK", arr.n_words, total)
"""


@pytest.mark.parametrize("san", ["thread"])
def test_threaded_loader_under_sanitizer(san, tmp_path):
    # compile check first: skip on toolchains without the sanitizer
    probe = tmp_path / "probe.cpp"
    probe.write_text("int main(){return 0;}")
    r = subprocess.run(
        ["g++", f"-fsanitize={san}", "-o", str(tmp_path / "probe"),
         str(probe)], capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"{san} sanitizer unavailable")
    env = dict(os.environ, SHRED_SANITIZE=san,
               TSAN_OPTIONS="halt_on_error=1")
    env.pop("JAX_PLATFORMS", None)
    # dlopen'ing a tsan-built .so needs the runtime preloaded (static
    # TLS block exhaustion otherwise)
    rtlib = {"thread": "libtsan.so", "address": "libasan.so",
             "undefined": "libubsan.so"}[san]
    rt = subprocess.run(["g++", f"-print-file-name={rtlib}"],
                        capture_output=True, text=True)
    lib = rt.stdout.strip()
    if os.path.isabs(lib):
        env["LD_PRELOAD"] = lib
    r = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                       capture_output=True, text=True, cwd=REPO,
                       timeout=600)
    assert r.returncode == 0, f"sanitized run failed:\n{r.stdout}\n{r.stderr}"
    assert "OK" in r.stdout


_SCRIPT_R3 = r"""
import numpy as np
from shredword_tpu.runtime import native
from shredword_tpu.runtime.native import NativeCorpus
from shredword_tpu.ops import pretok_ops

# streaming loader: tiny blocks, threaded scans, boundary carries
rng = np.random.RandomState(1)
words = [bytes(rng.randint(97, 123, rng.randint(2, 14)).astype('uint8'))
         for _ in range(400)]
data = b"\n".join(b" ".join(words[i] for i in rng.randint(0, 400, 30))
                  for _ in range(600))
path = "/tmp/shred_san_stream.txt"
open(path, "wb").write(data)
a = NativeCorpus.from_file(path, faithful_order=True).arrays()
b = NativeCorpus.from_file(path, faithful_order=True,
                           block_bytes=4096).arrays()
assert np.array_equal(a.counts, b.counts)

# span dedup over adversarial span shapes (empty, repeated, long)
flat = np.frombuffer(b"abcabcxyzabc" * 50 + b"q", np.uint8)
lens = np.array([3, 3, 3, 3, 0, 1] * 10, np.int64)
off = np.zeros(len(lens), np.int64)
np.cumsum(lens[:-1], out=off[1:])
inv, uniq = native.dedup_spans(flat, off, lens)
assert inv.max() == len(uniq) - 1

# native GPT scanner on malformed utf-8 (the r2 advisor's OOB case)
for bad in (b"\xf7\xbf\xbf\xbf", b"\xff\xfe", b"\x80\x80",
            b"\xe2\x28\xa1", b"\xf0\x9f", b"\xf4\x90\x80\x80",
            b"ok \xed\xa0\x80 done" * 20):
    native.gpt_starts_bytes(bad, pretok_ops.class_table())
print("OK R3")
"""


@pytest.mark.parametrize("san", ["address"])
def test_r3_native_paths_under_asan(san, tmp_path):
    """ASan over the round-3 native additions: streaming loader block
    carries, span dedup, and the UTF-8-validated GPT scanner (the exact
    OOB surface the round-2 advisor flagged)."""
    probe = tmp_path / "probe.cpp"
    probe.write_text("int main(){return 0;}")
    r = subprocess.run(
        ["g++", f"-fsanitize={san}", "-o", str(tmp_path / "probe"),
         str(probe)], capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"{san} sanitizer unavailable")
    env = dict(os.environ, SHRED_SANITIZE=san,
               ASAN_OPTIONS="halt_on_error=1:detect_leaks=0")
    env.pop("JAX_PLATFORMS", None)
    rt = subprocess.run(["g++", "-print-file-name=libasan.so"],
                        capture_output=True, text=True)
    lib = rt.stdout.strip()
    if os.path.isabs(lib):
        env["LD_PRELOAD"] = lib
    r = subprocess.run([sys.executable, "-c", _SCRIPT_R3], env=env,
                       capture_output=True, text=True, cwd=REPO,
                       timeout=600)
    assert r.returncode == 0, f"sanitized run failed:\n{r.stdout}\n{r.stderr}"
    assert "OK R3" in r.stdout
