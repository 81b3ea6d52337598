"""Model-level tests: shapes, jit, masking/quantizer/loss behavior."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from audio8_tpu.config import (
    AcousticConfig, EncoderConfig, PretrainConfig, PooledConfig,
    CONV_FEATURES, conv_output_length,
)
from audio8_tpu.models.wav2vec2 import (
    ConvFeatureExtractor,
    GumbelVectorQuantizer,
    Wav2Vec2AcousticModel,
    Wav2Vec2Encoder,
    Wav2Vec2Model,
    Wav2Vec2PooledEncoder,
    downsample_lengths,
    sample_negative_indices,
    wav2vec2_pretrain_loss,
)

# small config for fast tests
SMALL = dict(d_model=64, num_heads=4, num_layers=2, d_ff=128)
T_SAMPLES = 4000


def test_conv_output_length_matches_reference_stride():
    # 16 kHz stack: stride 320, receptive field 400
    assert conv_output_length(320 * 50 + 80, CONV_FEATURES[16]) == 50
    got = conv_output_length(T_SAMPLES, CONV_FEATURES[16])
    # torch oracle
    t = T_SAMPLES
    for (_, k, s) in CONV_FEATURES[16]:
        t = (t - k) // s + 1
    assert got == t


def test_conv_feature_extractor_matches_torch(rng):
    """Full conv stack vs a torch replica using the same weights."""
    feats = [(16, 10, 5), (16, 3, 2), (16, 2, 2)]
    x = rng.normal(size=(2, 500)).astype(np.float32)
    m = ConvFeatureExtractor(conv_features=tuple(feats))
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(params, jnp.asarray(x)))

    xt = torch.from_numpy(x).unsqueeze(1)  # (B, 1, T)
    p = params["params"]
    for i, (dim, k, s) in enumerate(feats):
        w = torch.from_numpy(np.transpose(np.asarray(p[f"conv_{i}"]["kernel"]), (2, 1, 0)))
        xt = F.conv1d(xt, w, stride=s)
        if i == 0:
            xt = F.group_norm(xt, dim,
                              torch.from_numpy(np.asarray(p["norm_0"]["scale"])),
                              torch.from_numpy(np.asarray(p["norm_0"]["bias"])), eps=1e-5)
        xt = torch.nn.GELU()(xt)
    want = xt.transpose(1, 2).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_downsample_lengths():
    # 4000 samples -> 12 frames at stride 320; ratio = 4000 // 12 = 333
    t_frames = conv_output_length(4000, CONV_FEATURES[16])
    lens = downsample_lengths(jnp.asarray([4000, 2000, 333]), 4000, t_frames)
    ratio = 4000 // t_frames
    assert np.asarray(lens).tolist() == [
        min(4000 // ratio, t_frames), 2000 // ratio, 333 // ratio]


def test_gumbel_quantizer_shapes_and_onehot(rng):
    m = GumbelVectorQuantizer(input_dim=32, num_vars=8, num_groups=2, vq_dim=16)
    x = jnp.asarray(rng.normal(size=(2, 5, 32)).astype(np.float32))
    params = m.init({"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}, x)
    # eval: quantized rows must be concatenations of codebook rows
    q, ppl = m.apply(params, x, 1.0, False)
    assert q.shape == (2, 5, 16)
    codebook = np.asarray(params["params"]["vars"])  # (G*V, 8)
    row = np.asarray(q)[0, 0]
    gdim = 8
    found0 = any(np.allclose(row[:gdim], codebook[i]) for i in range(8))
    found1 = any(np.allclose(row[gdim:], codebook[8 + i]) for i in range(8))
    assert found0 and found1
    assert 2.0 <= float(ppl) <= 16.0  # per-group ppl in [G, G*V]
    # train: straight-through output also snaps to codebook rows in value
    q_t, _ = m.apply(params, x, 2.0, True, rngs={"gumbel": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(q_t)).all()


def test_gumbel_quantizer_codebook_utils():
    m = GumbelVectorQuantizer(input_dim=4, num_vars=3, num_groups=2, vq_dim=4)
    x = jnp.zeros((1, 1, 4))
    params = m.init({"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}, x)
    bound = m.bind(params)
    idx = bound.codebook_indices()
    assert idx.shape == (9 * 2,)
    cb = np.asarray(bound.codebook())
    assert cb.shape == (9, 4)
    comp = bound.to_codebook_index(jnp.asarray([[0, 0], [1, 2], [2, 2]]))
    assert np.asarray(comp).tolist() == [0, 5, 8]
    samp = bound.sample_from_codebook(jax.random.PRNGKey(0), 2, 4)
    assert samp.shape == (2, 4, 4)


def test_sample_negative_indices_excludes_self():
    key = jax.random.PRNGKey(0)
    vc = jnp.asarray([10, 4])
    idx = np.asarray(sample_negative_indices(key, 2, 10, 50, vc))
    own = np.arange(10)[None, :, None]
    # valid slots never sample themselves and stay within valid range
    for b, n_valid in enumerate([10, 4]):
        sl = idx[b, :n_valid]
        assert (sl != own[:, :n_valid]).all()
        assert (sl < n_valid).all() and (sl >= 0).all()


def test_encoder_forward_and_padding(rng):
    cfg = EncoderConfig(**SMALL)
    m = Wav2Vec2Encoder(config=cfg)
    x = jnp.asarray(rng.normal(size=(2, T_SAMPLES)).astype(np.float32))
    lens = jnp.asarray([T_SAMPLES, T_SAMPLES // 2])
    params = m.init(jax.random.PRNGKey(0), x, lens)
    out, pad_mask = m.apply(params, x, lens)
    t_frames = conv_output_length(T_SAMPLES, CONV_FEATURES[16])
    assert out.shape == (2, t_frames, cfg.d_model)
    assert np.asarray(pad_mask).sum(-1)[0] == t_frames


@pytest.mark.slow
def test_acoustic_model_logprobs_and_freeze(rng):
    cfg = AcousticConfig(num_labels=30, **SMALL)
    m = Wav2Vec2AcousticModel(config=cfg)
    x = jnp.asarray(rng.normal(size=(2, T_SAMPLES)).astype(np.float32))
    lens = jnp.asarray([T_SAMPLES, T_SAMPLES // 2])
    params = m.init(jax.random.PRNGKey(0), x, lens)
    lp, pad = m.apply(params, x, lens)
    assert lp.shape[-1] == 30
    np.testing.assert_allclose(np.asarray(jnp.exp(lp)).sum(-1), 1.0, rtol=1e-4)

    # freeze=True: only the proj head gets gradients
    def loss_frozen(p):
        lp, _ = m.apply(p, x, lens, train=False, freeze=True)
        return jnp.sum(lp)

    g = jax.grad(loss_frozen)(params)["params"]
    assert np.abs(np.asarray(g["proj"]["kernel"])).sum() > 0
    enc_leaf = jax.tree_util.tree_leaves(g["encoder"])
    assert all(np.abs(np.asarray(l)).sum() == 0 for l in enc_leaf)

    # freeze=False, freeze_fx=True: encoder transformer gets grads, fx none
    def loss_unfrozen(p):
        lp, _ = m.apply(p, x, lens, train=False, freeze=False)
        return jnp.sum(lp)

    g = jax.grad(loss_unfrozen)(params)["params"]
    fx_leaf = jax.tree_util.tree_leaves(g["encoder"]["feature_extractor"])
    assert all(np.abs(np.asarray(l)).sum() == 0 for l in fx_leaf)
    tr = g["encoder"]["encoder"]["transformer"]
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in jax.tree_util.tree_leaves(tr))


def test_pooled_encoder_shapes(rng):
    for red in ["sha", "2ha_max", "max", "mean"]:
        cfg = PooledConfig(reduction_type=red, **SMALL)
        m = Wav2Vec2PooledEncoder(config=cfg)
        x = jnp.asarray(rng.normal(size=(2, T_SAMPLES)).astype(np.float32))
        lens = jnp.asarray([T_SAMPLES, T_SAMPLES // 2])
        params = m.init(jax.random.PRNGKey(0), x, lens)
        out = m.apply(params, x, lens)
        assert out.shape == (2, cfg.d_model), red


def test_pretrain_model_and_loss(rng):
    cfg = PretrainConfig(**SMALL, final_dim=32, num_vq_vars=16, num_vq_groups=2)
    m = Wav2Vec2Model(config=cfg)
    x = jnp.asarray(rng.normal(size=(2, T_SAMPLES)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    params = m.init(rngs, x, train=True)

    @jax.jit
    def step(p, x, key):
        km, kg, kd, kn = jax.random.split(key, 4)
        c, t, ppl, valid = m.apply(
            p, x, train=True, temperature=2.0,
            rngs={"mask": km, "gumbel": kg, "dropout": kd})
        n_vars = cfg.num_vq_vars * cfg.num_vq_groups
        return wav2vec2_pretrain_loss(c, t, ppl, valid, kn, n_vars, n_negatives=10)

    loss, metrics = step(params, x, jax.random.PRNGKey(7))
    assert np.isfinite(float(loss))
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0
    assert float(metrics["diversity_loss"]) >= 0.0

    # gradients flow to the codebook and encoder
    def lf(p):
        return step(p, x, jax.random.PRNGKey(7))[0]

    g = jax.grad(lf)(params)["params"]
    assert np.abs(np.asarray(g["quantizer"]["vars"])).sum() > 0
    assert np.abs(np.asarray(g["mask_emb"])).sum() > 0


def test_neg_lookup_onehot_bit_exact_vs_gather(rng):
    """_select_negatives("onehot") must be bit-exact with "gather" in value
    AND gradient: each one-hot row has a single nonzero, so the contraction
    has no reassociation (models/wav2vec2.py:_select_negatives)."""
    from audio8_tpu.models.wav2vec2 import _select_negatives

    B, M, N = 3, 29, 13
    sims = jnp.asarray(rng.normal(size=(B, M, M)).astype(np.float32))
    # include duplicate indices within a row (legal under sampling)
    idx = jnp.asarray(rng.integers(0, M, size=(B, M, N)).astype(np.int32))
    idx = idx.at[:, :, 1].set(idx[:, :, 0])

    def f(s, mode):
        return jnp.sum(jnp.sin(3.0 * _select_negatives(s, idx, mode)))

    vg, gg = jax.value_and_grad(lambda s: f(s, "gather"))(sims)
    vo, go = jax.value_and_grad(lambda s: f(s, "onehot"))(sims)
    assert float(vg) == float(vo)
    assert bool(jnp.all(gg == go))

    with pytest.raises(ValueError):
        _select_negatives(sims, idx, "nope")
