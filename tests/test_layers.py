"""Layer-level parity tests against torch CPU oracles.

The reference's layer library (eight_mile) wraps torch primitives, so torch
functional ops configured with fairseq/wav2vec2 semantics are the parity
oracle for our JAX layers (SURVEY.md §4 test strategy)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from audio8_tpu.nn.layers import Conv1D, GroupNorm, LayerNorm, PositionalConv, gelu
from audio8_tpu.nn.transformer import (
    MultiHeadAttention,
    TransformerEncoderStack,
    subsequent_mask,
)


def test_gelu_exact_matches_torch(rng):
    x = rng.normal(size=(4, 64)).astype(np.float32)
    got = np.asarray(gelu(jnp.asarray(x)))
    want = torch.nn.GELU()(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_conv1d_matches_torch(rng):
    b, t, cin, cout, k, stride = 2, 50, 8, 16, 10, 5
    x = rng.normal(size=(b, t, cin)).astype(np.float32)
    m = Conv1D(features=cout, kernel_size=k, stride=stride, use_bias=False)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    # torch: weight (out, in, k), input (B, C, T)
    w = np.transpose(np.asarray(params["params"]["kernel"]), (2, 1, 0))
    want = F.conv1d(
        torch.from_numpy(np.transpose(x, (0, 2, 1))), torch.from_numpy(w), stride=stride
    ).numpy()
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 1)), atol=1e-5)


def test_conv1d_nonoverlap_matmul_matches_torch(rng):
    # k == stride hits the exact reshape+matmul path (the wav2vec2 k=2/s=2
    # extractor layers); includes a T not divisible by k to check the
    # VALID-window trim
    for b, t, cin, cout, k in [(2, 40, 8, 16, 2), (2, 41, 8, 16, 2),
                               (1, 30, 4, 8, 3)]:
        x = rng.normal(size=(b, t, cin)).astype(np.float32)
        m = Conv1D(features=cout, kernel_size=k, stride=k, use_bias=False)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = np.asarray(m.apply(params, jnp.asarray(x)))
        w = np.transpose(np.asarray(params["params"]["kernel"]), (2, 1, 0))
        want = F.conv1d(
            torch.from_numpy(np.transpose(x, (0, 2, 1))), torch.from_numpy(w),
            stride=k,
        ).numpy()
        np.testing.assert_allclose(got, np.transpose(want, (0, 2, 1)),
                                   atol=1e-5)


def test_groupnorm_matches_torch_instance_case(rng):
    # the wav2vec2 case: GroupNorm(C, C) == per-channel instance norm
    b, t, c = 3, 20, 32
    x = rng.normal(size=(b, t, c)).astype(np.float32)
    m = GroupNorm(num_groups=c)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    want = F.group_norm(
        torch.from_numpy(np.transpose(x, (0, 2, 1))), c,
        torch.ones(c), torch.zeros(c), eps=1e-5,
    ).numpy()
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 1)), atol=1e-5)


def test_layernorm_matches_torch(rng):
    x = rng.normal(size=(2, 7, 24)).astype(np.float32)
    m = LayerNorm()
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    want = F.layer_norm(torch.from_numpy(x), (24,), eps=1e-5).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_positional_conv_matches_fairseq_semantics(rng):
    """fairseq pos_conv: pad k//2 both sides, drop last frame (even k), with
    weight_norm(dim=2) over the kernel and GELU."""
    b, t, c, k, groups = 2, 37, 16, 8, 4
    x = rng.normal(size=(b, t, c)).astype(np.float32)
    m = PositionalConv(features=c, kernel_size=k, groups=groups, dropout_rate=0.1)
    params = m.init(jax.random.PRNGKey(3), jnp.asarray(x))
    got = np.asarray(m.apply(params, jnp.asarray(x)))

    p = params["params"]
    v = np.asarray(p["weight_v"])  # (K, Cin/g, Cout)
    g = np.asarray(p["weight_g"])  # (K, 1, 1)
    bias = np.asarray(p["bias"])
    # torch weight layout (Cout, Cin/g, K); weight_norm dim=2 normalizes over
    # (Cout, Cin/g) per tap.
    w_t = torch.from_numpy(np.transpose(v, (2, 1, 0)))
    norm = w_t.norm(dim=(0, 1), keepdim=True)  # (1, 1, K)
    w_n = w_t * torch.from_numpy(np.transpose(g, (2, 1, 0))) / norm
    conv = F.conv1d(
        torch.from_numpy(np.transpose(x, (0, 2, 1))), w_n,
        torch.from_numpy(bias), padding=k // 2, groups=groups,
    )
    conv = conv[:, :, :-1]  # even kernel: fairseq drops the trailing frame
    want = torch.nn.GELU()(conv).numpy()
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 1)), atol=1e-5)


def _torch_mha(x, p, num_heads, mask=None):
    """Post-norm fairseq-style attention using our param tree, as an oracle."""
    q = F.linear(x, torch.from_numpy(np.asarray(p["w_Q"]["kernel"]).T),
                 torch.from_numpy(np.asarray(p["w_Q"]["bias"])))
    k = F.linear(x, torch.from_numpy(np.asarray(p["w_K"]["kernel"]).T),
                 torch.from_numpy(np.asarray(p["w_K"]["bias"])))
    v = F.linear(x, torch.from_numpy(np.asarray(p["w_V"]["kernel"]).T),
                 torch.from_numpy(np.asarray(p["w_V"]["bias"])))
    b, t, d = q.shape
    dh = d // num_heads

    def split(z):
        return z.view(b, t, num_heads, dh).transpose(1, 2)

    q, k, v = split(q) / dh ** 0.5, split(k), split(v)
    logits = q @ k.transpose(-1, -2)
    if mask is not None:
        logits = logits.masked_fill(~mask, -1e9)
    probs = torch.softmax(logits, dim=-1)
    out = (probs @ v).transpose(1, 2).reshape(b, t, d)
    return F.linear(out, torch.from_numpy(np.asarray(p["w_O"]["kernel"]).T),
                    torch.from_numpy(np.asarray(p["w_O"]["bias"])))


def test_mha_matches_torch_oracle(rng):
    b, t, d, h = 2, 9, 32, 4
    x = rng.normal(size=(b, t, d)).astype(np.float32)
    m = MultiHeadAttention(num_heads=h, d_model=d)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x), jnp.asarray(x))
    got = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x)))
    want = _torch_mha(torch.from_numpy(x), params["params"], h).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mha_pad_mask(rng):
    """Masked (padded) key positions must not affect unmasked outputs."""
    b, t, d, h = 2, 8, 16, 2
    x = rng.normal(size=(b, t, d)).astype(np.float32)
    m = MultiHeadAttention(num_heads=h, d_model=d)
    params = m.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(x), jnp.asarray(x))
    mask = np.ones((b, 1, 1, t), bool)
    mask[:, :, :, 5:] = False
    y1 = m.apply(params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), jnp.asarray(mask))
    x2 = x.copy()
    x2[:, 5:] = 123.0  # perturb padded positions
    y2 = m.apply(params, jnp.asarray(x2), jnp.asarray(x2), jnp.asarray(x2), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(y1)[:, :5], np.asarray(y2)[:, :5], atol=1e-4)


def test_encoder_stack_shapes_and_jit(rng):
    b, t, d = 2, 12, 32
    x = rng.normal(size=(b, t, d)).astype(np.float32)
    m = TransformerEncoderStack(num_heads=4, d_model=d, num_layers=2, d_ff=64)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    f = jax.jit(lambda p, x: m.apply(p, x))
    y = f(params, jnp.asarray(x))
    assert y.shape == (b, t, d)
    assert np.isfinite(np.asarray(y)).all()


def test_subsequent_mask():
    m = np.asarray(subsequent_mask(4))[0, 0]
    assert m[0, 0] and not m[0, 1] and m[3, 3] and m[3, 0]
