"""Block-causal streaming attention (causal_chunk_frames): prefix
equivalence, left-context capping, and CTC-driver integration."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio8_tpu.config import AcousticConfig, EncoderConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel, Wav2Vec2Encoder


def _cfg(**kw):
    # extractor_mode='layer': per-frame LayerNorm (causal-safe); the
    # default group-mode instance norm normalizes over the whole time
    # axis and can never stream. Small pos-conv bounds the lookahead.
    base = dict(d_model=32, num_heads=2, num_layers=2, d_ff=64,
                dropout=0.0, attention_dropout=0.0,
                timestep_masking=0.0, channel_masking=0.0,
                extractor_mode="layer", conv_pos_kernel=8,
                conv_pos_groups=2, causal_chunk_frames=4)
    base.update(kw)
    return EncoderConfig(**base)


@pytest.mark.slow
def test_prefix_equivalence(rng):
    """With chunk-causal attention, the encoder's output over a prefix
    matches the full run's prefix (outside the pos-conv/extractor
    lookahead margin) — the property that makes streaming exact."""
    cfg = _cfg()
    model = Wav2Vec2Encoder(config=cfg)
    wav = rng.normal(size=(1, 16_000)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(wav))["params"]

    full, _ = model.apply({"params": params}, jnp.asarray(wav))
    t_full = full.shape[1]  # 49 frames

    # a chunk-aligned prefix: 24 frames = 6 chunks of 4
    p_frames = 24
    p_samples = p_frames * 320 + 80  # stride 320; +80 keeps the conv
    # window of the last frame inside the prefix (receptive field 400)
    pref, _ = model.apply({"params": params},
                          jnp.asarray(wav[:, :p_samples]))
    assert pref.shape[1] >= p_frames
    # pos-conv lookahead: one-sided k/2 = 4 frames; conv extractor edge
    # adds ~1 frame. Frames further than that from the prefix end are
    # bit-comparable between the prefix run and the full run.
    margin = cfg.conv_pos_kernel // 2 + 2
    keep = p_frames - margin
    np.testing.assert_allclose(np.asarray(pref[:, :keep]),
                               np.asarray(full[:, :keep]),
                               rtol=1e-4, atol=1e-4)
    assert t_full > p_frames  # the comparison was a real prefix


def test_future_chunks_do_not_leak(rng):
    """Perturbing audio in a later chunk must not change earlier chunks'
    outputs (beyond the conv/pos-conv lookahead margin)."""
    cfg = _cfg()
    model = Wav2Vec2Encoder(config=cfg)
    wav = rng.normal(size=(1, 16_000)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(wav))["params"]
    out1, _ = model.apply({"params": params}, jnp.asarray(wav))

    wav2 = wav.copy()
    cut_frame = 32
    wav2[:, cut_frame * 320 + 400:] += 5.0  # perturb past frame 33's window
    out2, _ = model.apply({"params": params}, jnp.asarray(wav2))

    margin = cfg.conv_pos_kernel // 2 + 2
    keep = cut_frame - margin
    np.testing.assert_allclose(np.asarray(out1[:, :keep]),
                               np.asarray(out2[:, :keep]),
                               rtol=1e-4, atol=1e-4)
    # and the perturbation DID change later frames (the model is live)
    assert float(np.abs(np.asarray(out1[:, cut_frame + 4:])
                        - np.asarray(out2[:, cut_frame + 4:])).max()) > 1e-3


def test_without_causal_chunks_future_leaks(rng):
    """Control: the default bidirectional encoder does NOT have the
    prefix property — the causal mask is what provides it."""
    cfg = _cfg(causal_chunk_frames=0)
    model = Wav2Vec2Encoder(config=cfg)
    wav = rng.normal(size=(1, 16_000)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(wav))["params"]
    out1, _ = model.apply({"params": params}, jnp.asarray(wav))
    wav2 = wav.copy()
    wav2[:, -2000:] += 5.0
    out2, _ = model.apply({"params": params}, jnp.asarray(wav2))
    assert float(np.abs(np.asarray(out1[:, :8])
                        - np.asarray(out2[:, :8])).max()) > 1e-3


def test_left_context_cap(rng):
    """causal_left_chunks=1 bounds the receptive field: influence grows
    by one chunk per layer (plus one pos-conv chunk), so with 2 layers a
    chunk-0 perturbation cannot reach chunk 4+."""
    cfg = _cfg(causal_left_chunks=1)
    model = Wav2Vec2Encoder(config=cfg)
    wav = rng.normal(size=(1, 16_000)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(wav))["params"]
    out1, _ = model.apply({"params": params}, jnp.asarray(wav))

    # perturb chunk 0 (frames 0-3), keeping frame 3+'s conv windows clean
    wav2 = wav.copy()
    wav2[:, :4 * 320 - 400] += 5.0
    out2, _ = model.apply({"params": params}, jnp.asarray(wav2))
    # chunk-0 info reaches at most chunk 1 (pos-conv) + 2 (one per
    # attention layer) = chunk 3; frames >= 16 must be untouched
    np.testing.assert_allclose(np.asarray(out1[:, 16:]),
                               np.asarray(out2[:, 16:]),
                               rtol=1e-4, atol=1e-4)
    # liveness: nearer chunks DID change
    assert float(np.abs(np.asarray(out1[:, :8])
                        - np.asarray(out2[:, :8])).max()) > 1e-3


@pytest.mark.slow
def test_ctc_model_trains_with_causal_chunks(rng):
    """The acoustic model accepts the flag end-to-end (grads flow)."""
    cfg = AcousticConfig(
        num_labels=10, d_model=32, num_heads=2, num_layers=1, d_ff=64,
        extractor_mode="layer", conv_pos_kernel=8, conv_pos_groups=2,
        causal_chunk_frames=4, timestep_masking=0.0, channel_masking=0.0,
        freeze_fx=False)
    model = Wav2Vec2AcousticModel(config=cfg)
    sig = jnp.asarray(rng.normal(size=(2, 8000)).astype(np.float32))
    lens = jnp.asarray([8000, 6400], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), sig, lens)["params"]

    def loss_fn(p):
        lp, mask = model.apply({"params": p}, sig, lens, train=False,
                               freeze=False)
        return jnp.sum(lp ** 2)

    g = jax.grad(loss_fn)(params)
    assert all(bool(jnp.all(jnp.isfinite(l)))
               for l in jax.tree_util.tree_leaves(g))
