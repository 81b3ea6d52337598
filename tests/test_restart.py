"""Restart/warm-start resolution flows (cli/common.resolve_restart)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from audio8_tpu.cli.common import resolve_restart
from audio8_tpu.config import AcousticConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.train.checkpoint import save_checkpoint
from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
from tests.test_convert import make_fairseq_state, D, H, L, V

SMALL_CFG = AcousticConfig(num_labels=V, d_model=D, num_heads=H, num_layers=L,
                           dropout=0.0, timestep_masking=0.0, channel_masking=0.0)


def _init_model():
    model = Wav2Vec2AcousticModel(config=SMALL_CFG)
    x = jnp.zeros((1, 4000))
    return model, model.init(jax.random.PRNGKey(0), x)["params"]


def test_restart_from_pretrained_fairseq_pt(tmp_path):
    """Pretrained (non-CTC) fairseq .pt warm-starts the encoder; the CTC
    head keeps its init; quantizer keys are dropped, not injected
    (reference flow: load_fairseq_bin(model.encoder, ...), train.py:221)."""
    rng = np.random.default_rng(0)
    s = make_fairseq_state(rng)
    s["quantizer.vars"] = rng.normal(size=(1, 16, 16)).astype(np.float32)
    s["quantizer.weight_proj.weight"] = rng.normal(size=(16, 512)).astype(np.float32)
    s["quantizer.weight_proj.bias"] = np.zeros(16, np.float32)
    s["project_q.weight"] = np.eye(32, dtype=np.float32)
    s["project_q.bias"] = np.zeros(32, np.float32)
    s["final_proj.weight"] = rng.normal(size=(32, D)).astype(np.float32)
    s["final_proj.bias"] = np.zeros(32, np.float32)
    pt = str(tmp_path / "w2v.pt")
    torch.save({"model": {k: torch.from_numpy(v) for k, v in s.items()}}, pt)

    model, init = _init_model()
    params, state, step = resolve_restart(pt, init, ctc=True, num_layers=L)
    assert step == 0 and state is None
    # model must still apply cleanly (no unexpected quantizer params)
    x = jnp.zeros((1, 4000))
    lp, _ = model.apply({"params": params}, x)
    assert np.isfinite(np.asarray(lp)).all()
    # encoder weights came from the checkpoint
    got = np.asarray(params["encoder"]["proj_to_input"]["kernel"])
    np.testing.assert_allclose(got, s["post_extract_proj.weight"].T, atol=1e-6)


def test_restart_from_ctc_fairseq_pt(tmp_path):
    rng = np.random.default_rng(1)
    s = make_fairseq_state(rng, prefix="w2v_encoder.w2v_model.")
    s["w2v_encoder.proj.weight"] = rng.normal(size=(V, D)).astype(np.float32)
    s["w2v_encoder.proj.bias"] = np.zeros(V, np.float32)
    pt = str(tmp_path / "w2v_ctc.pt")
    torch.save({"model": {k: torch.from_numpy(v) for k, v in s.items()}}, pt)
    model, init = _init_model()
    params, _, _ = resolve_restart(pt, init, ctc=True, num_layers=L)
    np.testing.assert_allclose(np.asarray(params["proj"]["kernel"]),
                               s["w2v_encoder.proj.weight"].T, atol=1e-6)


def test_restart_from_a8t_checkpoint_dir(tmp_path):
    model, init = _init_model()
    tx = create_optimizer(create_lrs(1e-4, 100))
    state = TrainState.create(init, tx, step=77)
    save_checkpoint(state, str(tmp_path / "checkpoint"), 77)
    template = TrainState.create(init, tx)
    params, restored, step = resolve_restart(str(tmp_path), init, template)
    assert step == 77
    assert restored is not None and int(restored.step) == 77


def test_restart_ctc_from_a8t_pretrain_checkpoint(tmp_path):
    """Warm-start CTC from an a8t PRETRAINING checkpoint (Wav2Vec2Model
    layout) — the reference's 'load a8 checkpoint from pretrained wav2vec2
    w/o CTC' fallback (train.py:232-234)."""
    import jax.numpy as jnp
    from audio8_tpu.config import PretrainConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2Model

    pcfg = PretrainConfig(d_model=D, num_heads=H, num_layers=L, dropout=0.0,
                          final_dim=32, num_vq_vars=8, num_vq_groups=2)
    pmodel = Wav2Vec2Model(config=pcfg)
    rngs = {"params": jax.random.PRNGKey(5), "mask": jax.random.PRNGKey(6),
            "gumbel": jax.random.PRNGKey(7)}
    pparams = pmodel.init(rngs, jnp.zeros((1, 4000)), train=False)["params"]
    tx = create_optimizer(create_lrs(1e-4, 100))
    pstate = TrainState.create(pparams, tx, step=500)
    save_checkpoint(pstate, str(tmp_path / "checkpoint"), 500)

    model, init = _init_model()
    params, _, step = resolve_restart(str(tmp_path), init, ctc=True, num_layers=L)
    assert step == 500
    # encoder weights actually transferred (not silently dropped)
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["proj_to_input"]["kernel"]),
        np.asarray(pparams["proj_to_input"]["kernel"]), atol=1e-6)
    lp, _ = model.apply({"params": params}, jnp.zeros((1, 4000)))
    assert np.isfinite(np.asarray(lp)).all()
