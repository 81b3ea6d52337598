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
