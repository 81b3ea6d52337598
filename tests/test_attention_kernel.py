"""Whole-row fused attention kernel (ops/pallas/attention_kernel.py) vs the
XLA attention path, in interpret mode on the CPU backend.

The kernel serves the short-T training regime (see docstring: XLA core
11.8 ms vs kernel 9.9 ms for 12 cores f+b at the pretrain shape, and the
(B, H, T, T) probs never touch HBM).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio8_tpu.nn.transformer import MultiHeadAttention, TransformerEncoderStack
from audio8_tpu.ops.pallas.attention_kernel import attention_core, supported


def _ref_core(q, k, v, key_valid, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if key_valid is not None:
        s = jnp.where(key_valid[:, None, None, :], s, -1e9)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("masked", [False, True])
def test_attention_core_fwd_bwd_parity(rng, masked):
    b, h, t, dh = 2, 4, 37, 16
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, t, dh)).astype(np.float32))
               for _ in range(3))
    scale = 1.0 / np.sqrt(dh)
    kv = None
    if masked:
        kv = jnp.asarray(np.arange(t)[None, :] < np.array([t, 20])[:, None])

    o_ref = _ref_core(q, k, v, kv, scale)
    o = attention_core(q, k, v, kv, scale, 0.0)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=1e-5)

    dy = jnp.asarray(rng.normal(size=o_ref.shape).astype(np.float32))
    gr = jax.grad(lambda q, k, v: jnp.sum(_ref_core(q, k, v, kv, scale) * dy),
                  argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(lambda q, k, v: jnp.sum(attention_core(q, k, v, kv, scale, 0.0) * dy),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gr, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_attention_core_dropout_mask_consistency(rng):
    """The VJP must regenerate the identical mask: where the (undropped)
    output is zeroed by dropout-induced differences, grads stay finite, and
    the same seed reproduces the same output."""
    b, h, t, dh = 1, 2, 19, 8
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, t, dh)).astype(np.float32))
               for _ in range(3))
    seed = jnp.asarray([42], jnp.uint32)
    o1 = attention_core(q, k, v, None, 0.35, 0.1, seed)
    o2 = attention_core(q, k, v, None, 0.35, 0.1, seed)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = attention_core(q, k, v, None, 0.35, 0.1, jnp.asarray([43], jnp.uint32))
    assert np.any(np.asarray(o1) != np.asarray(o3))
    g = jax.grad(lambda q: jnp.sum(attention_core(q, k, v, None, 0.35, 0.1, seed) ** 2))(q)
    assert np.all(np.isfinite(np.asarray(g)))


def _mha(fused, drop=0.0):
    return MultiHeadAttention(num_heads=4, d_model=32, dropout_rate=drop,
                              fused_attention=fused)


@pytest.mark.parametrize("masked", [False, True])
def test_mha_fused_matches_xla_path(rng, masked):
    b, t, d = 2, 21, 32
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    mask = None
    if masked:
        lengths = jnp.asarray([21, 9])
        mask = (jnp.arange(t)[None, :] < lengths[:, None])[:, None, None, :]
    m_ref = _mha(False)
    params = m_ref.init(jax.random.PRNGKey(0), x, x, x, mask)
    y_ref = m_ref.apply(params, x, x, x, mask)
    y_fused = _mha(True).apply(params, x, x, x, mask)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-5)


def test_encoder_stack_fused_matches_xla_path(rng):
    b, t, d = 2, 18, 32
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    mask = (jnp.arange(t)[None, :] < jnp.asarray([18, 11])[:, None])[:, None, None, :]
    kw = dict(num_heads=4, d_model=d, num_layers=2, d_ff=64, dropout_rate=0.0)
    ref = TransformerEncoderStack(fused_attention=False, **kw)
    params = ref.init(jax.random.PRNGKey(0), x, mask)
    y_ref = ref.apply(params, x, mask)
    y_fused = TransformerEncoderStack(fused_attention=True, **kw).apply(
        params, x, mask)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-5)


def test_fused_gate_declines_causal_and_cache(rng):
    m = _mha(True)  # forced on, so only the structural gate can decline
    # causal (1, 1, T, T) mask is not expressible as key rows -> None
    causal = jnp.tril(jnp.ones((5, 5), bool))[None, None]
    bound = m.bind(m.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 5, 32)), jnp.zeros((1, 5, 32)),
                          jnp.zeros((1, 5, 32))))
    assert bound._fused_eligible(causal, None, 5, 5) is None
    assert bound._fused_eligible(None, {"k": 0}, 5, 5) is None
    # cross-attention (T_q != T_k) is not expressible in the kernel
    assert bound._fused_eligible(None, None, 5, 9) is None
    # eligible shape IS accepted when forced
    assert bound._fused_eligible(None, None, 5, 5) is False

    m_off = _mha(None)
    bound_off = m_off.bind(m_off.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 5, 32)), jnp.zeros((1, 5, 32)),
        jnp.zeros((1, 5, 32))))
    # default (opt-in off) -> None even for eligible shapes
    assert bound_off._fused_eligible(None, None, 5, 5) is None
    assert not supported(5, 8, None, None)  # TPU-only gate


def test_mha_fused_cross_attention_falls_back(rng):
    """fused_attention=True on a cross-attention call (T_q != T_k) must fall
    back to the XLA path, not crash in the kernel's square-shape prep."""
    b, tq, tk, d = 1, 5, 9, 32
    xq = jnp.asarray(rng.normal(size=(b, tq, d)).astype(np.float32))
    xkv = jnp.asarray(rng.normal(size=(b, tk, d)).astype(np.float32))
    m_ref = _mha(False)
    params = m_ref.init(jax.random.PRNGKey(0), xq, xkv, xkv)
    y_ref = m_ref.apply(params, xq, xkv, xkv)
    y = _mha(True).apply(params, xq, xkv, xkv)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)
