"""Pallas CTC kernel vs the lax.scan reference and torch (interpret mode
on CPU; the same code compiles with Mosaic on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from audio8_tpu.ops.ctc import ctc_loss
from audio8_tpu.ops.pallas.ctc_kernel import ctc_loss_pallas


def _case(rng, b=3, t=24, v=7, u_max=6, blank=0):
    logits = rng.normal(size=(b, t, v)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    il = rng.integers(t // 2, t + 1, size=b).astype(np.int32)
    tl = rng.integers(1, u_max + 1, size=b).astype(np.int32)
    tgt = rng.integers(1, v, size=(b, u_max)).astype(np.int32)
    return lp, il, tgt, tl


def test_pallas_ctc_matches_scan_loss(rng):
    lp, il, tgt, tl = _case(rng)
    got = ctc_loss_pallas(jnp.asarray(lp), jnp.asarray(il), jnp.asarray(tgt),
                          jnp.asarray(tl), 0)
    want = ctc_loss(jnp.asarray(lp), jnp.asarray(il), jnp.asarray(tgt),
                    jnp.asarray(tl), blank=0, reduction="none")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_pallas_ctc_repeats_and_short(rng):
    lp, il, _, _ = _case(rng, b=2, t=20, v=5)
    tgt = np.array([[2, 2, 3, 3, 2], [1, 1, 1, 1, 1]], np.int32)
    tl = np.array([5, 3], np.int32)
    got = ctc_loss_pallas(jnp.asarray(lp), jnp.asarray(il), jnp.asarray(tgt),
                          jnp.asarray(tl), 0)
    want = ctc_loss(jnp.asarray(lp), jnp.asarray(il), jnp.asarray(tgt),
                    jnp.asarray(tl), blank=0, reduction="none")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_pallas_ctc_impossible_zeroed(rng):
    lp, _, _, _ = _case(rng, b=1, t=3, v=6)
    tgt = np.array([[1, 2, 3, 4]], np.int32)
    got = ctc_loss_pallas(jnp.asarray(lp), jnp.asarray([3], np.int32),
                          jnp.asarray(tgt), jnp.asarray([4], np.int32), 0)
    np.testing.assert_allclose(np.asarray(got), [0.0])


def test_pallas_ctc_grad_matches_torch(rng):
    b, t, v, u_max = 2, 16, 6, 4
    logits = rng.normal(size=(b, t, v)).astype(np.float32)
    il = rng.integers(t // 2, t + 1, size=b).astype(np.int32)
    tl = rng.integers(1, u_max + 1, size=b).astype(np.int32)
    tgt = rng.integers(1, v, size=(b, u_max)).astype(np.int32)

    def f(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return jnp.sum(ctc_loss_pallas(lp, jnp.asarray(il), jnp.asarray(tgt),
                                       jnp.asarray(tl), 0))

    got = np.asarray(jax.grad(f)(jnp.asarray(logits)))

    lg_t = torch.from_numpy(np.transpose(logits, (1, 0, 2)).copy()).requires_grad_(True)
    loss = F.ctc_loss(
        lg_t.log_softmax(-1), torch.from_numpy(tgt.astype(np.int64)),
        torch.from_numpy(il.astype(np.int64)), torch.from_numpy(tl.astype(np.int64)),
        blank=0, reduction="sum", zero_infinity=True)
    loss.backward()
    want = np.transpose(lg_t.grad.numpy(), (1, 0, 2))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
