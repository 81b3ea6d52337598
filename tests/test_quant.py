"""int8 post-training quantization (ops/quant.py + Dense int8 path).

Beyond-reference serving capability: the reference has no quantized
inference (/root/reference/audio8/test.py is plain f32 eval)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio8_tpu.config import AcousticConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.nn.layers import Dense, int8_dot
from audio8_tpu.ops.quant import (
    quantize_dense_tree,
    quantize_kernel,
    quantize_model_params,
)

SMALL = dict(d_model=64, num_heads=4, num_layers=2, d_ff=128)


def test_int8_dot_close_to_f32(rng):
    x = jnp.asarray(rng.normal(size=(4, 7, 96)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(96, 128)).astype(np.float32))
    kq, scale = quantize_kernel(k)
    assert kq.dtype == jnp.int8 and scale.shape == (128,)
    got = int8_dot(x, kq, scale, jnp.float32)
    want = x @ k
    # per-token + per-channel scales keep the 8-bit error ~1%
    rel = np.abs(np.asarray(got - want)).max() / np.abs(np.asarray(want)).max()
    assert rel < 0.02, rel


def test_dense_dispatches_on_int8_kernel(rng):
    x = np.asarray(rng.normal(size=(3, 80)), np.float32)
    m = Dense(96)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    want = np.asarray(m.apply(params, jnp.asarray(x)))
    qtree, n = quantize_dense_tree(params["params"])
    assert n == 1 and qtree["kernel"].dtype == jnp.int8
    got = np.asarray(m.apply({"params": qtree}, jnp.asarray(x)))
    assert np.abs(got - want).max() / np.abs(want).max() < 0.02


def test_quantize_tree_selective():
    tree = {
        "big": {"kernel": jnp.ones((64, 128)), "bias": jnp.zeros((128,))},
        "tiny": {"kernel": jnp.ones((64, 8)), "bias": jnp.zeros((8,))},
        "conv": {"kernel": jnp.ones((3, 64, 64))},
        "wnorm": {"kernel": jnp.ones((64, 64)), "g": jnp.ones((64,))},
        "norm": {"scale": jnp.ones((64,)), "bias": jnp.zeros((64,))},
    }
    out, n = quantize_dense_tree(tree, min_dim=64)
    assert n == 1
    assert out["big"]["kernel"].dtype == jnp.int8
    assert "kernel_scale" in out["big"] and "bias" in out["big"]
    # tiny Dense, conv (3-D), weight-normed and norm nodes untouched
    assert out["tiny"]["kernel"].dtype == jnp.float32
    assert out["conv"]["kernel"].dtype == jnp.float32
    assert out["wnorm"]["kernel"].dtype == jnp.float32
    assert "kernel_scale" not in out["wnorm"]
    # idempotent: re-quantizing is a no-op
    out2, n2 = quantize_dense_tree(out, min_dim=64)
    assert n2 == 0


def test_quantize_model_params_raises_on_empty():
    with pytest.raises(ValueError):
        quantize_model_params({"params": {"norm": {"scale": jnp.ones((4,))}}})


def test_acoustic_model_int8_end_to_end(rng):
    """Quantized encoder stays close to f32: same greedy path on most
    frames and small log-prob drift through the full 2-layer stack."""
    cfg = AcousticConfig(num_labels=12, timestep_masking=0.0,
                         channel_masking=0.0, **SMALL)
    model = Wav2Vec2AcousticModel(config=cfg)
    sig = jnp.asarray(rng.normal(size=(2, 4000)).astype(np.float32))
    lens = jnp.asarray([4000, 3200])
    params = model.init(jax.random.PRNGKey(0), sig, lens)["params"]
    lp, mask = model.apply({"params": params}, sig, lens)

    qparams = quantize_model_params(params)
    lpq, maskq = model.apply({"params": qparams}, sig, lens)

    assert lpq.shape == lp.shape
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(maskq))
    a = np.asarray(lp)[np.asarray(mask, bool)]
    b = np.asarray(lpq)[np.asarray(mask, bool)]
    # log-probs drift a little; the decoded argmax path should barely move
    agree = (a.argmax(-1) == b.argmax(-1)).mean()
    assert agree > 0.95, agree
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos


@pytest.mark.slow
def test_quantized_apply_is_jittable(rng):
    cfg = AcousticConfig(num_labels=12, timestep_masking=0.0,
                         channel_masking=0.0, **SMALL)
    model = Wav2Vec2AcousticModel(config=cfg, dtype=jnp.bfloat16)
    sig = jnp.asarray(rng.normal(size=(1, 4000)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), sig)["params"]
    qparams = quantize_model_params(params)

    @jax.jit
    def fwd(s):
        return model.apply({"params": qparams}, s)

    lp, _ = fwd(sig)
    assert np.isfinite(np.asarray(lp, np.float32)).all()
