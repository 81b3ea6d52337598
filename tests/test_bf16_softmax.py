"""bf16 attention softmax: numerics guard.

The bf16_softmax fast path (softmax over compute-dtype logits, +8%
measured step throughput on v5e) must stay a small perturbation of the
f32-softmax bf16 model: log-probs close and greedy argmax essentially
unchanged. It must be a no-op for f32 models (parity path)."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from audio8_tpu.config import AcousticConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel


def _logprobs(bf16_softmax, dtype, params=None, x=None, lengths=None):
    cfg = AcousticConfig(num_labels=16, d_model=64, num_heads=4, num_layers=2,
                         d_ff=128, dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0, bf16_softmax=bf16_softmax)
    model = Wav2Vec2AcousticModel(config=cfg, dtype=dtype)
    if params is None:
        params = model.init(jax.random.PRNGKey(0), x, lengths)["params"]
    lp, _ = model.apply({"params": params}, x, lengths, train=False, freeze=True)
    return np.asarray(lp), params


@pytest.mark.slow
def test_bf16_softmax_close_to_f32_softmax(rng):
    x = jnp.asarray(rng.normal(size=(2, 8000)).astype(np.float32))
    lengths = jnp.asarray([8000, 6000], jnp.int32)
    lp_fast, params = _logprobs(True, jnp.bfloat16, x=x, lengths=lengths)
    lp_slow, _ = _logprobs(False, jnp.bfloat16, params, x, lengths)
    np.testing.assert_allclose(lp_fast, lp_slow, atol=5e-2)
    # random weights give near-flat logits, the worst case for argmax
    # stability — trained heads are decisive (see tools/parity_eval.py)
    agree = (lp_fast.argmax(-1) == lp_slow.argmax(-1)).mean()
    assert agree > 0.95, agree


def test_bf16_softmax_noop_for_f32(rng):
    x = jnp.asarray(rng.normal(size=(1, 8000)).astype(np.float32))
    lengths = jnp.asarray([8000], jnp.int32)
    lp_on, params = _logprobs(True, jnp.float32, x=x, lengths=lengths)
    lp_off, _ = _logprobs(False, jnp.float32, params, x, lengths)
    np.testing.assert_array_equal(lp_on, lp_off)
