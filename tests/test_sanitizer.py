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
