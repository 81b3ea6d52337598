"""Fused attention-BLOCK kernel (projections inside;
ops/pallas/attention_block_kernel.py) vs the XLA path, interpret mode.

The block kernel exists to remove the pallas_call boundary that made the
core-only kernel lose end-to-end (docs/PERF.md): same math as
MultiHeadAttention's XLA path including the Q/K/V/O projections and
biases, so parity is tested at the MODULE level — identical params,
identical inputs, `fused_attention=None` vs `"block"`.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio8_tpu.nn.transformer import MultiHeadAttention


def _pair(num_heads=4, d_model=32, rate=0.0):
    xla = MultiHeadAttention(num_heads=num_heads, d_model=d_model,
                             dropout_rate=rate)
    blk = MultiHeadAttention(num_heads=num_heads, d_model=d_model,
                             dropout_rate=rate, fused_attention="block")
    return xla, blk


@pytest.mark.parametrize("masked", [False, True])
def test_block_fwd_parity(rng, masked):
    b, t, d = 2, 37, 32
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    mask = None
    if masked:
        kv = np.arange(t)[None, :] < np.array([t, 21])[:, None]
        mask = jnp.asarray(kv)[:, None, None, :]
    xla, blk = _pair()
    params = xla.init(jax.random.PRNGKey(0), x, x, x, mask)["params"]
    o_ref = xla.apply({"params": params}, x, x, x, mask)
    o = blk.apply({"params": params}, x, x, x, mask)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               atol=2e-5, rtol=2e-5)


def test_block_grad_parity(rng):
    """Grads wrt the input AND every projection weight/bias match the
    XLA path (the custom VJP recomputes + reduces per-(b,h) partials)."""
    b, t, d = 2, 29, 32
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    kv = np.arange(t)[None, :] < np.array([t, 17])[:, None]
    mask = jnp.asarray(kv)[:, None, None, :]
    xla, blk = _pair()
    params = xla.init(jax.random.PRNGKey(0), x, x, x, mask)["params"]
    dy = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))

    def loss(mod):
        def f(p, xx):
            return jnp.sum(mod.apply({"params": p}, xx, xx, xx, mask) * dy)
        return f

    g_ref = jax.grad(loss(xla), argnums=(0, 1))(params, x)
    g_blk = jax.grad(loss(blk), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(g_blk[1]), np.asarray(g_ref[1]),
                               atol=3e-5, rtol=3e-5)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref[0])
    flat_blk = dict(jax.tree_util.tree_leaves_with_path(g_blk[0]))
    for path, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_blk[path]), np.asarray(leaf),
            atol=3e-5, rtol=3e-5,
            err_msg=jax.tree_util.keystr(path))


def test_block_dropout_deterministic_and_masked(rng):
    """Same dropout rng -> identical output; different rng -> different;
    deterministic=True matches the XLA eval path exactly."""
    b, t, d = 1, 19, 32
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    xla, blk = _pair(rate=0.25)
    params = xla.init(jax.random.PRNGKey(0), x, x, x)["params"]
    o1 = blk.apply({"params": params}, x, x, x, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(7)})
    o2 = blk.apply({"params": params}, x, x, x, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(7)})
    o3 = blk.apply({"params": params}, x, x, x, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(8)})
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert np.any(np.asarray(o1) != np.asarray(o3))
    o_eval = blk.apply({"params": params}, x, x, x)
    o_eval_ref = xla.apply({"params": params}, x, x, x)
    np.testing.assert_allclose(np.asarray(o_eval), np.asarray(o_eval_ref),
                               atol=2e-5, rtol=2e-5)


def test_block_ineligible_falls_back(rng):
    """Cross-attention (different q/kv arrays) and init-time tracing use
    the XLA path — outputs still correct, params still created."""
    b, t, d = 1, 11, 32
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    mem = jnp.asarray(rng.normal(size=(b, 5, d)).astype(np.float32))
    _, blk = _pair()
    params = blk.init(jax.random.PRNGKey(0), x, mem, mem)["params"]
    assert "w_Q" in params  # init created params through the fallback
    out = blk.apply({"params": params}, x, mem, mem)
    assert out.shape == (b, t, d)


def test_block_inside_encoder_stack(rng):
    """fused_attention='block' threads through TransformerEncoderStack:
    stack outputs match the XLA stack bit-for-tolerance."""
    from audio8_tpu.nn.transformer import TransformerEncoderStack

    b, t, d = 2, 23, 32
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    kv = np.arange(t)[None, :] < np.array([t, 13])[:, None]
    mask = jnp.asarray(kv)[:, None, None, :]
    kw = dict(num_heads=4, d_model=d, num_layers=2, d_ff=64,
              dropout_rate=0.0, pre_norm=False)
    ref = TransformerEncoderStack(**kw)
    fus = TransformerEncoderStack(**kw, fused_attention="block")
    params = ref.init(jax.random.PRNGKey(0), x, mask)["params"]
    o_ref = ref.apply({"params": params}, x, mask)
    o = fus.apply({"params": params}, x, mask)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               atol=5e-5, rtol=5e-5)
