"""Training-dynamics parity: N CTC fine-tune steps from converted
identical init in OUR stack vs the torch replica (VERDICT r3 #2).

Forward parity alone does not certify the fine-tuning recipe — the
reference's de-facto correctness mechanism is "converted checkpoint +
training works" (/root/reference/audio8/train.py:215-252,
convert_wav2vec2_checkpoint.py). This runs the actual production step
(make_ctc_steps fused grad+update: sum-CTC loss, grads scaled by
1/batch_size, global-norm clip, AdamW — mirroring train.py:316-326) and a
step-equivalent torch loop (torch_ref.forward_t + F.ctc_loss +
torch.optim.AdamW) from the SAME converted weights, and asserts the
loss and grad-norm trajectories stay glued together."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from audio8_tpu.config import AcousticConfig, conv_output_length
from audio8_tpu.models.convert import convert_ctc_state, merge_params
from audio8_tpu.models.pt_reader import load_state_dict
from audio8_tpu.models.torch_ref import forward_t
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
from audio8_tpu.train.steps import make_ctc_steps
from audio8_tpu.utils import Offsets

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "fairseq_golden")
FX = ((32, 10, 5), (32, 3, 2))
D, H, L, V = 64, 4, 2, 12
N_STEPS = 10
# 2e-4 keeps the trajectory in the smooth descent regime where float32
# accumulation differences stay ~1e-5/step; at 1e-3 the tiny model's loss
# oscillates chaotically and step-7+ diverges past any honest tolerance
LR, CLIP = 2e-4, 25.0


def _batch(rng):
    b, t, u = 2, 4000, 6
    signal = rng.normal(size=(b, t)).astype(np.float32)
    tokens = rng.integers(4, V, size=(b, u)).astype(np.int32)
    lengths = np.array([u, u - 2], np.int32)
    # zero out past-length tokens like the data pipeline's padding
    tokens[1, u - 2:] = Offsets.PAD
    return signal, tokens, lengths


def _torch_trajectory(state_np, signal, tokens, lengths):
    """Step-equivalent torch loop: sum-reduction CTC (blank=GO,
    zero_infinity — reference ctc.py:196-205), grads scaled by 1/B
    (scale_grads(num_gpus/batch_size) ≡ sum-grad / global examples,
    train.py:323), clip 25, AdamW(lr const, wd 0)."""
    import torch.nn.functional as TF

    prefix = "w2v_encoder.w2v_model."
    params = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
              for k, v in state_np.items()}
    opt = torch.optim.AdamW(params.values(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.0)
    x = torch.from_numpy(signal)
    tgt = torch.from_numpy(tokens.astype(np.int64))
    tlen = torch.from_numpy(lengths.astype(np.int64))
    tp = conv_output_length(signal.shape[1], FX)
    flen = torch.full((signal.shape[0],), tp, dtype=torch.int64)

    losses, gnorms = [], []
    for _ in range(N_STEPS):
        opt.zero_grad()
        _, h = forward_t(lambda n: params[prefix + n], x, num_heads=H,
                         fx=list(FX), d=D, l=L)
        logits = TF.linear(h, params["w2v_encoder.proj.weight"],
                           params["w2v_encoder.proj.bias"])
        lp = TF.log_softmax(logits.float(), dim=-1)
        loss = TF.ctc_loss(lp.transpose(0, 1), tgt, flen, tlen,
                           blank=Offsets.GO, reduction="sum",
                           zero_infinity=True)
        loss.backward()
        b = signal.shape[0]
        for p in params.values():
            if p.grad is not None:
                p.grad /= b
        gnorm = torch.nn.utils.clip_grad_norm_(params.values(), CLIP)
        opt.step()
        losses.append(float(loss.detach()))
        gnorms.append(float(gnorm))
    return np.array(losses), np.array(gnorms)


def _ours_trajectory(state_np, signal, tokens, lengths):
    params_conv, report = convert_ctc_state(state_np, num_layers=L,
                                            num_fx_layers=len(FX))
    assert report["missing"] == []
    cfg = AcousticConfig(num_labels=V, d_model=D, num_heads=H, num_layers=L,
                         custom_conv_features=FX, dropout=0.0,
                         timestep_masking=0.0, channel_masking=0.0,
                         freeze_fx=False)
    model = Wav2Vec2AcousticModel(config=cfg)
    batch = {
        "signal": jnp.asarray(signal),
        "signal_lengths": jnp.full((signal.shape[0],), signal.shape[1],
                                   jnp.int32),
        "token_ids": jnp.asarray(tokens),
        "token_lengths": jnp.asarray(lengths),
    }
    init = model.init(jax.random.PRNGKey(0), batch["signal"],
                      batch["signal_lengths"])["params"]
    params = merge_params(init, params_conv)
    tx = create_optimizer(create_lrs(LR, N_STEPS, sched_type="constant",
                                     warmup_steps=0),
                          weight_decay=0.0)
    state = TrainState.create(params, tx)
    grad_fn, update_fn, _ = make_ctc_steps(model, tx, clip=CLIP)

    losses, gnorms = [], []
    key = jax.random.PRNGKey(0)  # deterministic: dropout/masking all 0
    for _ in range(N_STEPS):
        loss, grads, bsz, _ = grad_fn(state.params, batch, key, freeze=False)
        # grad norm AFTER the 1/B scaling, matching clip_grad_norm_'s
        # measurement point in the torch loop
        gnorm = float(jax.tree_util.tree_reduce(
            lambda a, g: a + np.sum(np.square(np.asarray(g, np.float64))),
            grads, 0.0)) ** 0.5 / float(bsz)
        state, _ = update_fn(state, grads, bsz)
        losses.append(float(loss))
        gnorms.append(gnorm)
    return np.array(losses), np.array(gnorms)


def test_ctc_finetune_dynamics_parity():
    Offsets.remap_fairseq_ctc()
    state_np = load_state_dict(os.path.join(FIX, "ctc_tiny.pt"))
    signal, tokens, lengths = _batch(np.random.default_rng(11))

    t_loss, t_gnorm = _torch_trajectory(state_np, signal, tokens, lengths)
    o_loss, o_gnorm = _ours_trajectory(state_np, signal, tokens, lengths)

    # trajectories must be glued, not merely both-decreasing (measured
    # headroom ~50x: loss rel <= 1.2e-5, gnorm rel <= 4.3e-4 on CPU)
    np.testing.assert_allclose(o_loss, t_loss, rtol=1e-3)
    np.testing.assert_allclose(o_gnorm, t_gnorm, rtol=5e-3)
    # and the dynamics must be real dynamics: training moved the loss
    # (measured: 1644 -> 798 over the 10 steps)
    assert t_loss[-1] < t_loss[0] * 0.7
    # step-1 agreement is the converted-init sanity anchor (tight)
    np.testing.assert_allclose(o_loss[0], t_loss[0], rtol=1e-4)
