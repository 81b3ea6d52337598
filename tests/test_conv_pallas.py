"""Pallas k3s2 conv kernel vs lax.conv (interpret mode on the CPU backend).

Covers the three kernels (fwd, dgrad, wgrad) against XLA's conv and its
autodiff on the wav2vec2 extractor's layer shape family, including the
odd/even T_in edge cases the tail-row handling in _dgrad_pallas covers.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio8_tpu.nn.layers import _conv1d_nwc
from audio8_tpu.ops.pallas.conv_kernel import conv1d_k3s2, supported


SHAPES = [
    (2, 37, 128, 128),    # minimal multiple-of-128 channels
    (1, 259, 256, 128),   # asymmetric channels
    (3, 1027, 128, 256),  # crosses the 512-row tile boundary
    (2, 36, 128, 128),    # even T_in -> 2 tail rows in dgrad
    (1, 19, 128, 128),    # tiny: tile rounds up to 8
]


@pytest.mark.parametrize("shape", SHAPES)
def test_fwd_matches_lax_conv(rng, shape):
    b, t, ci, co = shape
    x = jnp.asarray(rng.normal(size=(b, t, ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, ci, co)).astype(np.float32) * 0.05)
    ref = _conv1d_nwc(x, w, 2, "VALID")
    got = conv1d_k3s2(x, w)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("shape", SHAPES)
def test_grads_match_lax_conv(rng, shape):
    b, t, ci, co = shape
    x = jnp.asarray(rng.normal(size=(b, t, ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, ci, co)).astype(np.float32) * 0.05)
    t_out = (t - 3) // 2 + 1
    dy = jnp.asarray(rng.normal(size=(b, t_out, co)).astype(np.float32))

    gx_r, gw_r = jax.grad(
        lambda x, w: jnp.sum(_conv1d_nwc(x, w, 2, "VALID") * dy),
        argnums=(0, 1))(x, w)
    gx_p, gw_p = jax.grad(
        lambda x, w: jnp.sum(conv1d_k3s2(x, w) * dy), argnums=(0, 1))(x, w)

    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-4)
    scale = float(jnp.max(jnp.abs(gw_r)))
    np.testing.assert_allclose(
        np.asarray(gw_p) / scale, np.asarray(gw_r) / scale, atol=1e-5)


def test_bf16_close_to_f32_conv(rng):
    b, t, ci, co = 2, 515, 128, 128
    x = jnp.asarray(rng.normal(size=(b, t, ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, ci, co)).astype(np.float32) * 0.05)
    ref = _conv1d_nwc(x, w, 2, "VALID")
    got = conv1d_k3s2(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    assert got.dtype == jnp.bfloat16
    rel = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.05


def test_supported_gate():
    # the gate is TPU-only; on the CPU test backend it must refuse
    assert not supported((8, 1000, 512), 3, 2, "VALID", 1, jnp.bfloat16)
