"""Test harness config.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; real-TPU runs happen in bench).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # env pre-sets "axon" (real TPU tunnel)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize re-registers the TPU tunnel regardless of the
# env var; the config knob set before first backend use wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_corpus_text():
    from golden.corpus_gen import small_corpus
    return small_corpus()


@pytest.fixture(scope="session")
def zipf_corpus_text():
    from golden.corpus_gen import zipf_corpus
    return zipf_corpus()


@pytest.fixture(scope="session")
def small_corpus_file(tmp_path_factory, small_corpus_text):
    p = tmp_path_factory.mktemp("corpus") / "small.txt"
    p.write_text(small_corpus_text)
    return str(p)


@pytest.fixture(scope="session")
def zipf_corpus_file(tmp_path_factory, zipf_corpus_text):
    p = tmp_path_factory.mktemp("corpus") / "zipf.txt"
    p.write_text(zipf_corpus_text)
    return str(p)
