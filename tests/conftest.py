"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware (the standard
JAX pattern for testing distributed code)."""
import os

# Force override: the session environment pins JAX_PLATFORMS to the TPU
# plugin (and its sitecustomize re-forces it via jax.config at interpreter
# start), but unit tests must run on the virtual 8-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

# Persistent XLA compile cache: most of the suite's wall-clock is XLA
# recompiling the same fixed-shape tiny models run after run; the cache
# key covers HLO + compile options + backend, so hits are exact. On the
# 1-vCPU dev box this takes the `-m "not slow"` lane from 18:19 cold to
# ~10:30-11:30 warm (docs/DESIGN.md "Testing tiers").
# A8T_TEST_COMPILE_CACHE=off disables; any other value overrides the dir.
_cache = os.environ.get(
    "A8T_TEST_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "a8t_test_xla"))
if _cache and _cache != "off":  # empty string = unset (YAML env blocks)
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _restore_offsets():
    """Offsets is mutable class-level state (drivers call
    ``remap_fairseq_ctc``); restore it after every test so a CLI-driving
    test cannot leak the fairseq id layout into later tests."""
    from audio8_tpu.utils import Offsets

    saved = (Offsets.PAD, Offsets.GO, Offsets.EOS, Offsets.UNK,
             list(Offsets.VALUES))
    yield
    Offsets.PAD, Offsets.GO, Offsets.EOS, Offsets.UNK = saved[:4]
    Offsets.VALUES[:] = saved[4]
