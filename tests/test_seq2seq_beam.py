"""Beam-search decode for Seq2Seq (extension beyond the reference's
greedy-only decode): the beam must never score worse than greedy under
the model's own sequence log-probability."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio8_tpu.models.seq2seq import create_seq2seq_model
from audio8_tpu.utils import Offsets

V, L = 16, 12


@pytest.fixture(scope="module")
def model_and_params():
    Offsets.remap_fairseq_ctc()
    model = create_seq2seq_model(vocab_size=V, d_model=32, num_heads=2,
                                 num_layers=1, d_ff=64, decoder_heads=2,
                                 decoder_layers=1, dropout=0.0)
    sig = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8000)),
                      jnp.float32)
    lens = jnp.full((2,), 8000, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), sig, lens,
                        jnp.zeros((2, 4), jnp.int32),
                        jnp.full((2,), 4, jnp.int32))["params"]
    return model, params, sig, lens


def _sequence_score(model, params, sig, lens, tokens, lengths):
    """Sum of per-step log p(token | prefix) via teacher forcing."""
    b, t = tokens.shape
    dst_in = jnp.concatenate(
        [jnp.full((b, 1), Offsets.GO, jnp.int32), tokens[:, :-1]], axis=1)
    lp = model.apply({"params": params}, sig, lens, dst_in,
                     jnp.maximum(lengths, 1))
    picked = jnp.take_along_axis(lp, tokens[..., None], axis=-1)[..., 0]
    mask = jnp.arange(t)[None, :] < lengths[:, None]
    return jnp.sum(jnp.where(mask, picked, 0.0), axis=-1)


def test_beam1_equals_greedy(model_and_params):
    model, params, sig, lens = model_and_params
    g_tok, g_len = model.apply({"params": params}, sig, lens,
                               max_output_len=L, method=model.decode)
    b_tok, b_len = model.apply({"params": params}, sig, lens, beam=1,
                               max_output_len=L, method=model.decode_beam)
    np.testing.assert_array_equal(np.asarray(g_tok), np.asarray(b_tok))
    np.testing.assert_array_equal(np.asarray(g_len), np.asarray(b_len))


def test_beam_scores_at_least_greedy(model_and_params):
    model, params, sig, lens = model_and_params
    g_tok, g_len = model.apply({"params": params}, sig, lens,
                               max_output_len=L, method=model.decode)
    b_tok, b_len = model.apply({"params": params}, sig, lens, beam=4,
                               length_penalty=0.0,  # raw log-prob comparison
                               max_output_len=L, method=model.decode_beam)
    gs = _sequence_score(model, params, sig, lens, g_tok, g_len)
    bs = _sequence_score(model, params, sig, lens, b_tok, b_len)
    assert np.all(np.asarray(bs) >= np.asarray(gs) - 1e-4), (bs, gs)


def test_beam_decode_jits(model_and_params):
    model, params, sig, lens = model_and_params

    @jax.jit
    def run(p, x, l):
        return model.apply({"params": p}, x, l, beam=3, max_output_len=L,
                           method=model.decode_beam)

    tok, length = run(params, sig, lens)
    assert tok.shape == (2, L)
    assert np.all(np.asarray(length) <= L)
    # deterministic across calls
    tok2, _ = run(params, sig, lens)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(tok2))
