"""Mixture-of-Experts FFN + expert parallelism (nn/moe.py).

Beyond the reference (dense FFN only); guards: dispatch/combine algebra
against a per-token reference computation, identical-experts == dense
parity, capacity enforcement, EP-sharded == replicated numerics, and the
aux loss reaching the CTC/pretrain objectives through the factories."""
import numpy as np
import jax
import pytest
import jax.numpy as jnp

from audio8_tpu.config import AcousticConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.nn.moe import MoEFFN
from audio8_tpu.parallel.sharding import (
    TP_RULES, batch_sharding, make_mesh, shard_params,
)


def _moe(e=4, top_k=1, cap=2.0, d=16, f=32):
    return MoEFFN(d_ff=f, d_model=d, num_experts=e, top_k=top_k,
                  capacity_factor=cap)


def _reference_moe(params, x, e, top_k, cap_factor):
    """Per-token numpy re-computation of Switch/GShard routing with
    capacity, applied against the same expert weights."""
    import math

    s, d = x.shape
    cap = min(max(int(math.ceil(top_k * s * cap_factor / e)), 1), s)
    logits = x @ np.asarray(params["router"]["kernel"], np.float32)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    wi, bi = np.asarray(params["wi"]), np.asarray(params["bi"])
    wo, bo = np.asarray(params["wo"]), np.asarray(params["bo"])

    # capacity is shared across the top-k passes (kept counts roll into
    # the next pass's slot base): replay in pass order with one counter
    counts = np.zeros(e, np.int64)
    kept = []
    masked = probs.copy()
    for _ in range(top_k):
        idx = np.argmax(masked, axis=-1)
        for t in range(s):
            ex = int(idx[t])
            if counts[ex] < cap:
                kept.append((t, ex, probs[t, ex]))
                counts[ex] += 1
        masked = masked * (1.0 - np.eye(e)[idx])

    gates = {}
    for t, ex, g in kept:
        gates.setdefault(t, []).append((ex, g))

    def gelu(v):
        from scipy.stats import norm
        return v * norm.cdf(v)

    y = np.zeros((s, d), np.float32)
    for t, pairs in gates.items():
        tot = sum(g for _, g in pairs)
        for ex, g in pairs:
            w = g / tot if top_k == 2 else g
            h = gelu(x[t] @ wi[ex] + bi[ex])
            y[t] += w * (h @ wo[ex] + bo[ex])
    return y


def test_moe_matches_per_token_reference():
    rng = np.random.default_rng(0)
    for top_k in (1, 2):
        m = _moe(top_k=top_k)
        x = rng.normal(size=(1, 24, 16)).astype(np.float32)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))[0]
        want = _reference_moe(params, x[0], e=4, top_k=top_k, cap_factor=2.0)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_moe_identical_experts_equal_dense_ffn():
    """With every expert's weights set equal and capacity ample, MoE top-1
    output == the dense FFN with those weights (gate=prob scales the
    output, so compare at gate ~= 1 by making routing saturated)."""
    rng = np.random.default_rng(1)
    m = _moe(e=2, top_k=2, cap=4.0)
    x = rng.normal(size=(2, 8, 16)).astype(np.float32)
    params = jax.tree_util.tree_map(np.asarray,
                                    m.init(jax.random.PRNGKey(0),
                                           jnp.asarray(x))["params"])
    # identical experts
    for k in ("wi", "bi", "wo", "bo"):
        params[k] = np.stack([params[k][0]] * 2)
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))

    # dense equivalent: top-2 gates renormalize to 1, so y == FFN(x)
    from scipy.stats import norm
    xf = x.reshape(-1, 16)
    h = xf @ params["wi"][0] + params["bi"][0]
    h = h * norm.cdf(h)
    want = (h @ params["wo"][0] + params["bo"][0]).reshape(2, 8, 16)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_moe_capacity_drops_overflow_tokens():
    """Force every token to expert 0 with capacity 1: exactly one token
    keeps a gate, the rest fall through with zero output (the residual
    carries them in the transformer layer)."""
    rng = np.random.default_rng(2)
    m = MoEFFN(d_ff=32, d_model=16, num_experts=4, top_k=1,
               capacity_factor=1e-9)
    # strictly positive inputs so kernel[0,0]=100 routes EVERY token to
    # expert 0 (logit_0 = 100*x_0 > 0, all other logits 0)
    x = (np.abs(rng.normal(size=(1, 8, 16))) + 0.1).astype(np.float32)
    params = jax.tree_util.tree_map(np.asarray,
                                    m.init(jax.random.PRNGKey(0),
                                           jnp.asarray(x))["params"])
    params["router"]["kernel"] = np.zeros_like(params["router"]["kernel"])
    params["router"]["kernel"][0, 0] = 100.0  # all tokens -> expert 0
    y = np.asarray(m.apply({"params": params}, jnp.asarray(x)))[0]
    nonzero_rows = np.abs(y).sum(-1) > 1e-6
    assert nonzero_rows.sum() == 1, nonzero_rows


@pytest.mark.slow
def test_moe_acoustic_model_ep_sharding_matches_replicated():
    """A wav2vec2 CTC model with MoE layers: EP (expert axis over 'model')
    + TP sharded forward == replicated forward."""
    assert len(jax.devices()) == 8
    cfg = AcousticConfig(num_labels=12, d_model=64, num_heads=4, num_layers=2,
                         d_ff=128, dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0, moe_experts=4, moe_every=2,
                         moe_capacity_factor=2.0)
    model = Wav2Vec2AcousticModel(config=cfg)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(8, 4000)).astype(np.float32)
    lens = np.full((8,), 4000, np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(lens))["params"]
    # layer_1 (moe_every=2) must be the MoE layer
    l1 = params["encoder"]["encoder"]["transformer"]["layer_1"]["ffn"]
    assert "wi" in l1 and l1["wi"].shape[0] == 4

    ref, _ = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(lens))
    ref = np.asarray(ref)

    mesh = make_mesh(data=4, model=2)
    sharded = shard_params(params, mesh, TP_RULES)
    wi = jax.tree_util.tree_map(
        lambda l: l, sharded["encoder"]["encoder"]["transformer"]["layer_1"]["ffn"]["wi"])
    assert "model" in str(wi.sharding.spec)
    bs = batch_sharding(mesh)

    @jax.jit
    def fwd(p, x, l):
        lp, _ = model.apply({"params": p}, x, l)
        return lp

    got = np.asarray(fwd(sharded, jax.device_put(x, bs),
                         jax.device_put(lens, bs)))
    np.testing.assert_allclose(got, ref, atol=2e-4)


@pytest.mark.slow
def test_moe_pretrain_step_trains_and_reports_aux():
    """The contrastive-pretrain factory handles MoE: one fused train step
    runs with a MoE encoder, metrics report the aux loss, and it is >= 1
    (its analytic minimum at perfect balance)."""
    from audio8_tpu.config import PretrainConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2Model
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_pretrain_steps

    cfg = PretrainConfig(d_model=64, num_heads=4, num_layers=2, d_ff=128,
                         final_dim=32, num_vq_vars=16, num_vq_groups=2,
                         dropout=0.0, moe_experts=4, moe_capacity_factor=2.0)
    model = Wav2Vec2Model(config=cfg)
    rng = np.random.default_rng(5)
    signal = jnp.asarray(rng.normal(size=(2, 8000)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    params = model.init(rngs, signal, train=True)["params"]
    tx = create_optimizer(create_lrs(5e-4, 100, warmup_steps=10))
    train_step, _ = make_pretrain_steps(model, tx, clip=1.0, n_negatives=4)
    state, metrics = train_step(TrainState.create(params, tx), signal,
                                jax.random.PRNGKey(7))
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["moe_aux"]) >= 1.0 - 1e-5


def _supervised_batch(rng, b=2, t=8000, u=6, v_lo=4, v_hi=12):
    return {
        "signal": jnp.asarray(rng.normal(size=(b, t)).astype(np.float32)),
        "signal_lengths": jnp.full((b,), t, jnp.int32),
        "token_ids": jnp.asarray(rng.integers(v_lo, v_hi, size=(b, u)),
                                 jnp.int32),
        "token_lengths": jnp.full((b,), u, jnp.int32),
    }


@pytest.mark.slow
def test_moe_seq2seq_factory_trains():
    """--moe_experts 4 trains one step through make_seq2seq_steps, and the
    aux loss reaches the objective (loss differs between aux weights)."""
    from audio8_tpu.config import DecoderConfig, EncoderConfig
    from audio8_tpu.models.seq2seq import Seq2Seq
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_seq2seq_steps

    rng = np.random.default_rng(0)
    batch = _supervised_batch(rng)
    tx = create_optimizer(create_lrs(1e-4, 100, warmup_steps=10))
    losses = {}
    for w in (0.0, 0.1):
        enc = EncoderConfig(d_model=64, num_heads=4, num_layers=2, d_ff=128,
                            dropout=0.0, timestep_masking=0.0,
                            channel_masking=0.0, moe_experts=4,
                            moe_aux_weight=w, moe_capacity_factor=2.0)
        dec = DecoderConfig(vocab_size=12, d_model=64, num_heads=4,
                            num_layers=1, dropout=0.0)
        model = Seq2Seq(encoder_config=enc, decoder_config=dec)
        params = model.init(
            jax.random.PRNGKey(0), batch["signal"], batch["signal_lengths"],
            batch["token_ids"][:, :-1],
            jnp.maximum(batch["token_lengths"] - 1, 0))["params"]
        grad_fn, update_fn, _, _ = make_seq2seq_steps(model, tx)
        loss, grads, bsz, _ = grad_fn(params, batch, jax.random.PRNGKey(1),
                                      freeze=False)
        losses[w] = float(loss)
        assert np.isfinite(losses[w])
        state, gnorm = update_fn(TrainState.create(params, tx), grads, bsz)
        assert int(state.step) == 1 and np.isfinite(float(gnorm))
    assert losses[0.1] > losses[0.0]


@pytest.mark.slow
def test_moe_transducer_factory_trains():
    from audio8_tpu.config import TransducerConfig
    from audio8_tpu.models.transducer import Transducer
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_transducer_steps

    rng = np.random.default_rng(1)
    batch = _supervised_batch(rng, u=4)
    cfg = TransducerConfig(vocab_size=12, d_model=64, num_heads=4,
                           num_layers=2, d_ff=128, pred_layers=1,
                           pred_dim=32, pred_embed_dim=16, d_joint=32,
                           dropout=0.0, pred_dropout=0.0,
                           timestep_masking=0.0, channel_masking=0.0,
                           moe_experts=4, moe_aux_weight=0.05,
                           moe_capacity_factor=2.0)
    model = Transducer(config=cfg)
    params = model.init(jax.random.PRNGKey(0), batch["signal"],
                        batch["signal_lengths"],
                        batch["token_ids"])["params"]
    tx = create_optimizer(create_lrs(1e-4, 100, warmup_steps=10))
    grad_fn, update_fn, _, _ = make_transducer_steps(model, tx)
    loss, grads, bsz, _ = grad_fn(params, batch, jax.random.PRNGKey(1),
                                  freeze=False)
    assert np.isfinite(float(loss))
    state, gnorm = update_fn(TrainState.create(params, tx), grads, bsz)
    assert int(state.step) == 1 and np.isfinite(float(gnorm))


def test_moe_hubert_factory_trains():
    from audio8_tpu.config import HubertPretrainConfig
    from audio8_tpu.models.hubert import HubertPretrainModel
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_hubert_steps

    rng = np.random.default_rng(2)
    cfg = HubertPretrainConfig(num_clusters=8, final_dim=16, d_model=64,
                               num_heads=4, num_layers=2, d_ff=128,
                               dropout=0.0, moe_experts=4,
                               moe_aux_weight=0.05, moe_capacity_factor=2.0)
    model = HubertPretrainModel(config=cfg)
    signal = jnp.asarray(rng.normal(size=(2, 8000)).astype(np.float32))
    lengths = jnp.full((2,), 8000, jnp.int32)
    # 8000 samples -> 24 encoder frames; cluster targets per frame
    n_frames = 24
    batch = {
        "signal": signal, "signal_lengths": lengths,
        "token_ids": jnp.asarray(
            rng.integers(0, 8, size=(2, n_frames)), jnp.int32),
        "token_lengths": jnp.full((2,), n_frames, jnp.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        signal, lengths, train=True)["params"]
    tx = create_optimizer(create_lrs(1e-4, 100, warmup_steps=10))
    train_step, _ = make_hubert_steps(model, tx)
    state, metrics = train_step(TrainState.create(params, tx), batch,
                                jax.random.PRNGKey(3))
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["moe_aux"]) >= 1.0 - 1e-5


def test_moe_data2vec_factory_trains():
    from audio8_tpu.config import Data2VecPretrainConfig
    from audio8_tpu.models.data2vec import Data2VecAudioModel
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_data2vec_steps

    rng = np.random.default_rng(3)
    cfg = Data2VecPretrainConfig(d_model=64, num_heads=4, num_layers=2,
                                 d_ff=128, dropout=0.0, moe_experts=4,
                                 moe_aux_weight=0.05,
                                 moe_capacity_factor=2.0)
    model = Data2VecAudioModel(config=cfg)
    signal = jnp.asarray(rng.normal(size=(2, 8000)).astype(np.float32))
    lengths = jnp.full((2,), 8000, jnp.int32)
    batch = {"signal": signal, "signal_lengths": lengths}
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        signal, lengths, train=True)["params"]
    teacher = jax.tree_util.tree_map(jnp.copy, params)
    tx = create_optimizer(create_lrs(1e-4, 100, warmup_steps=10))
    train_step, _ = make_data2vec_steps(model, tx)
    state, teacher, metrics = train_step(TrainState.create(params, tx),
                                         teacher, batch,
                                         jax.random.PRNGKey(4))
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["moe_aux"]) >= 1.0 - 1e-5


@pytest.mark.slow
def test_moe_paired_factory_trains():
    from audio8_tpu.config import PooledConfig, TextEncoderConfig
    from audio8_tpu.models.dual_encoder import (DualEncoderModel,
                                                SymmetricCLIPLoss)
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_paired_steps

    rng = np.random.default_rng(5)
    batch = _supervised_batch(rng)
    ac = PooledConfig(d_model=64, num_heads=4, num_layers=2, d_ff=128,
                      dropout=0.0, timestep_masking=0.0,
                      channel_masking=0.0, reduction_type="max",
                      moe_experts=4, moe_aux_weight=0.05,
                      moe_capacity_factor=2.0)
    tc = TextEncoderConfig(vocab_size=12, d_model=32, num_heads=2,
                           num_layers=1, d_ff=64, reduction_type="max")
    model = DualEncoderModel(audio_config=ac, text_config=tc, output_dim=16)
    loss_module = SymmetricCLIPLoss(init_temperature=0.07,
                                    learn_temperature=True)
    mp = model.init(jax.random.PRNGKey(0), batch["signal"],
                    batch["signal_lengths"], batch["token_ids"],
                    batch["token_lengths"])["params"]
    a, t = model.apply({"params": mp}, batch["signal"],
                       batch["signal_lengths"], batch["token_ids"],
                       batch["token_lengths"])
    lp = loss_module.init(jax.random.PRNGKey(1), a, t,
                          jnp.ones((2,), jnp.float32))["params"]
    params = {"model": mp, "loss": lp}
    tx = create_optimizer(create_lrs(1e-4, 100, warmup_steps=10))
    grad_fn, update_fn, _ = make_paired_steps(model, loss_module, tx)
    loss, metrics, grads, bsz, _ = grad_fn(
        params, batch, jax.random.PRNGKey(2),
        freeze_audio=False, freeze_text=False)
    assert np.isfinite(float(loss))
    assert float(metrics["moe_aux"]) >= 1.0 - 1e-5
    state, gnorm = update_fn(TrainState.create(params, tx), grads, bsz)
    assert int(state.step) == 1 and np.isfinite(float(gnorm))


@pytest.mark.slow
def test_moe_aux_loss_reaches_ctc_objective():
    """make_ctc_steps adds moe_aux_weight * aux * examples: the same batch
    with aux weight 0 vs >0 yields different losses, both finite, and one
    fused train step runs."""
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_ctc_steps

    rng = np.random.default_rng(4)
    b, t, u = 4, 4000, 8
    batch = {
        "signal": jnp.asarray(rng.normal(size=(b, t)).astype(np.float32)),
        "signal_lengths": jnp.full((b,), t, jnp.int32),
        "token_ids": jnp.asarray(rng.integers(4, 12, size=(b, u)), jnp.int32),
        "token_lengths": jnp.full((b,), u, jnp.int32),
    }
    tx = create_optimizer(create_lrs(1e-4, 100, warmup_steps=10))

    losses = {}
    for w in (0.0, 0.1):
        cfg = AcousticConfig(num_labels=12, d_model=64, num_heads=4,
                             num_layers=2, d_ff=128, dropout=0.0,
                             timestep_masking=0.0, channel_masking=0.0,
                             moe_experts=4, moe_aux_weight=w,
                             moe_capacity_factor=2.0)
        model = Wav2Vec2AcousticModel(config=cfg)
        params = model.init(jax.random.PRNGKey(0), batch["signal"],
                            batch["signal_lengths"])["params"]
        grad_fn, update_fn, _ = make_ctc_steps(model, tx, clip=25.0)
        loss, grads, bsz, _ = grad_fn(params, batch, jax.random.PRNGKey(1),
                                      freeze=False)
        losses[w] = float(loss)
        assert np.isfinite(losses[w])
        state, gnorm = update_fn(TrainState.create(params, tx), grads, bsz)
        assert np.isfinite(float(gnorm))
    # aux > 0 strictly increases the objective (aux loss >= 1 by Cauchy-
    # Schwarz at any routing; equality only at perfect balance)
    assert losses[0.1] > losses[0.0]
