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
import math
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


# ---------------------------------------------------------------- pretrain
# The contrastive pretraining objective (reference pretrain.py:168-216 +
# wav2vec2.py:371-396: Gumbel VQ + InfoNCE + diversity) gets the same
# treatment as CTC above (VERDICT r4 #2): N production train steps
# (make_pretrain_steps — unmodified, jitted) vs a step-equivalent torch
# loop from the same converted weights, with IDENTICAL randomness.
#
# Randomness capture: the production step derives its rngs
# deterministically (train/steps.py:199-207: mask=fold_in(rng,1),
# gumbel=fold_in(rng,2), negatives=fold_in(rng,3)), and flax's make_rng
# fold path is identical eager vs jit. So a single EAGER model.apply per
# step with recording wrappers around span_mask / hash_gumbel yields the
# exact concrete mask and Gumbel noise the jitted step will regenerate;
# negative indices come straight from sample_negative_indices (called
# with the folded key directly, no flax scope). The torch side applies
# those arrays verbatim — no test-only injection path in production code.

G_VQ, V_VQ, VQ_DIM = 2, 8, 32  # pretrained_tiny.pt quantizer geometry
N_NEG = 20
PRETRAIN_LR = 2e-4


def _pretrain_cfg():
    from audio8_tpu.config import PretrainConfig
    return PretrainConfig(
        d_model=D, num_heads=H, num_layers=L, custom_conv_features=FX,
        num_vq_vars=V_VQ, num_vq_groups=G_VQ, final_dim=VQ_DIM,
        dropout=0.0, attention_dropout=0.0, dropout_input=0.0,
        dropout_features=0.0, channel_masking=0.0)


def _capture_randomness(model, params, signal, step_keys):
    """Per-step (time_mask, idx, valid, gumbels, neg_idx) as numpy, by
    running the model EAGERLY with the production step's exact rng
    folding and recording the two in-scope draws."""
    import audio8_tpu.models.wav2vec2 as w2v_mod
    import audio8_tpu.ops.hashrand as hashrand_mod
    from audio8_tpu.models.wav2vec2 import sample_negative_indices
    from audio8_tpu.ops.masks import compact_mask_indices

    real_span_mask = w2v_mod.span_mask
    real_hash_gumbel = hashrand_mod.hash_gumbel
    rec = {}

    def rec_span_mask(*a, **k):
        out = real_span_mask(*a, **k)
        rec["mask"] = np.asarray(out)
        return out

    def rec_hash_gumbel(*a, **k):
        out = real_hash_gumbel(*a, **k)
        rec["gumbel"] = np.asarray(out)
        return out

    w2v_mod.span_mask = rec_span_mask
    hashrand_mod.hash_gumbel = rec_hash_gumbel
    per_step = []
    try:
        for rng in step_keys:
            rec.clear()
            rngs = {"dropout": jax.random.fold_in(rng, 0),
                    "mask": jax.random.fold_in(rng, 1),
                    "gumbel": jax.random.fold_in(rng, 2)}
            model.apply({"params": params}, jnp.asarray(signal), train=True,
                        temperature=2.0, rngs=rngs)
            mask = rec["mask"]
            capacity = rec["gumbel"].shape[1]
            idx, valid = compact_mask_indices(jnp.asarray(mask), capacity)
            idx, valid = np.asarray(idx), np.asarray(valid)
            vc = valid.sum(-1)
            neg_idx = np.asarray(sample_negative_indices(
                jax.random.fold_in(rng, 3), mask.shape[0], capacity, N_NEG,
                jnp.asarray(vc)))
            per_step.append((mask, idx, valid, rec["gumbel"], neg_idx))
    finally:
        w2v_mod.span_mask = real_span_mask
        hashrand_mod.hash_gumbel = real_hash_gumbel
    return per_step


def _torch_pretrain_trajectory(state_np, signal, per_step_rand):
    """Step-equivalent torch loop for the contrastive objective: masked
    encoder forward (mask_emb substitution), hard straight-through
    Gumbel VQ at the production anneal temperature, project_q/final_proj,
    cosine InfoNCE over injected negatives, valid-weighted diversity —
    AdamW(lr const, wd 0), clip 1.0, NO 1/B grad scaling (the pretrain
    step has none: loss is already slot-averaged, train/steps.py)."""
    import torch.nn.functional as TF

    from audio8_tpu.config import DIVERSITY_WGT, XE_WGT
    from audio8_tpu.train.steps import current_temperature

    params = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
              for k, v in state_np.items()}
    g = lambda n: params[n]
    opt = torch.optim.AdamW(params.values(), lr=PRETRAIN_LR,
                            betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0)
    x = torch.from_numpy(signal)
    n_vars = G_VQ * V_VQ

    losses, gnorms = [], []
    for step, (mask, idx, valid, gumbels, neg_idx) in \
            enumerate(per_step_rand):
        opt.zero_grad()
        temp = float(current_temperature(jnp.asarray(step)))
        tm = torch.from_numpy(mask)
        idx_t = torch.from_numpy(idx.astype(np.int64))
        valid_t = torch.from_numpy(valid)

        feat, h = forward_t(g, x, num_heads=H, fx=list(FX), d=D, l=L,
                            time_mask=tm)
        b, cap = idx.shape
        c0 = feat.shape[-1]
        # quantizer input: UNMASKED features (post-layernorm, pre-proj)
        # gathered at the masked slots — models/wav2vec2.py:626
        y = torch.gather(feat, 1, idx_t[..., None].expand(-1, -1, c0))
        logits = TF.linear(y, g("quantizer.weight_proj.weight"),
                           g("quantizer.weight_proj.bias"))
        logits = logits.reshape(b, cap, G_VQ, V_VQ).float()
        # valid-weighted per-group soft perplexity (GumbelVectorQuantizer)
        probs = torch.softmax(logits, dim=-1)
        w = valid_t.reshape(b * cap, 1, 1).float()
        avg = (probs.reshape(b * cap, G_VQ, V_VQ) * w).sum(0) \
            / torch.clamp(w.sum(), min=1.0)
        ppl = torch.exp(-(avg * torch.log(avg + 1e-7)).sum(-1)).sum()
        # hard straight-through Gumbel softmax with the injected noise
        y_soft = torch.softmax(
            (logits + torch.from_numpy(gumbels)) / temp, dim=-1)
        index = y_soft.argmax(-1)
        y_hard = TF.one_hot(index, V_VQ).float()
        one_hot = y_hard - y_soft.detach() + y_soft
        codebook = g("quantizer.vars").reshape(G_VQ, V_VQ, -1)
        quantized = torch.einsum("bmgv,gvd->bmgd", one_hot,
                                 codebook).reshape(b, cap, VQ_DIM)
        targets = TF.linear(quantized, g("project_q.weight"),
                            g("project_q.bias"))
        ctx = torch.gather(h, 1, idx_t[..., None].expand(-1, -1, D))
        context = TF.linear(ctx, g("final_proj.weight"),
                            g("final_proj.bias"))

        # cosine InfoNCE with our clamped-rsqrt normalization semantics
        l2n = lambda z: z * torch.rsqrt(
            torch.clamp((z * z).sum(-1, keepdim=True), min=1e-16))
        c_hat, t_hat = l2n(context.float()), l2n(targets.float())
        sims = torch.einsum("bmc,bnc->bmn", c_hat, t_hat)
        pos = torch.diagonal(sims, dim1=1, dim2=2)
        negs = torch.gather(sims, 2,
                            torch.from_numpy(neg_idx.astype(np.int64)))
        cl = torch.cat([pos[..., None], negs], dim=2)
        xe = torch.logsumexp(cl, dim=-1) - cl[..., 0]
        wv = valid_t.float()
        denom = torch.clamp(wv.sum(), min=1.0)
        xe_loss = (xe * wv).sum() / denom
        diversity = DIVERSITY_WGT * (n_vars - ppl) / n_vars
        loss = XE_WGT * xe_loss + diversity

        loss.backward()
        gnorm = torch.nn.utils.clip_grad_norm_(params.values(), 1.0)
        opt.step()
        losses.append(float(loss.detach()))
        gnorms.append(float(gnorm))
    return np.array(losses), np.array(gnorms)


@pytest.mark.slow  # ~45 s on a 1-vCPU box (10 torch + 10 jitted steps)
def test_pretrain_dynamics_parity():
    from audio8_tpu.models.convert import convert_pretrained_state
    from audio8_tpu.models.wav2vec2 import Wav2Vec2Model
    from audio8_tpu.train.steps import make_pretrain_steps

    state_np = load_state_dict(os.path.join(FIX, "pretrained_tiny.pt"))
    signal = np.random.default_rng(13).normal(size=(2, 4000)) \
        .astype(np.float32)

    params_conv, report = convert_pretrained_state(
        state_np, num_layers=L, num_fx_layers=len(FX))
    assert report["missing"] == []
    cfg = _pretrain_cfg()
    model = Wav2Vec2Model(config=cfg)
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    init = model.init(rngs, jnp.asarray(signal), train=True)["params"]
    params = merge_params(init, params_conv)

    step_keys = list(jax.random.split(jax.random.PRNGKey(23), N_STEPS))
    per_step_rand = _capture_randomness(model, params, signal, step_keys)

    # ours: the UNMODIFIED production step (jitted, temp anneal included)
    tx = create_optimizer(create_lrs(PRETRAIN_LR, N_STEPS,
                                     sched_type="constant", warmup_steps=0),
                          weight_decay=0.0)
    state = TrainState.create(params, tx)
    train_step, _ = make_pretrain_steps(model, tx, clip=1.0,
                                        n_negatives=N_NEG)
    o_loss, o_gnorm = [], []
    for i in range(N_STEPS):
        state, metrics = train_step(state, jnp.asarray(signal),
                                    step_keys[i])
        o_loss.append(float(metrics["loss"]))
        o_gnorm.append(float(metrics["grad_norm"]))
    o_loss, o_gnorm = np.array(o_loss), np.array(o_gnorm)

    t_loss, t_gnorm = _torch_pretrain_trajectory(state_np, signal,
                                                 per_step_rand)

    # glued trajectories (measured headroom ~600x: loss rel <= 1.8e-6,
    # gnorm rel <= 4.7e-7 on CPU; loss moves 0.980 -> 0.699 over 10 steps)
    np.testing.assert_allclose(o_loss, t_loss, rtol=1e-3)
    np.testing.assert_allclose(o_gnorm, t_gnorm, rtol=5e-3)
    # the dynamics are real: the optimizer moved the loss over 10 steps
    assert t_loss[-1] < t_loss[0] - 0.1
    # step-1 agreement anchors the converted init + randomness capture
    np.testing.assert_allclose(o_loss[0], t_loss[0], rtol=1e-4)


# ----------------------------------------------------------------- seq2seq
# Third objective: the seq2seq CE recipe (reference train_seq2seq.py:
# teacher forcing + SequenceLoss). With the production freeze=True phase
# the encoder output is a stop-gradient constant, so the differential
# isolates the DECODER training dynamics — the one component the CTC and
# pretrain differentials above do not cover (encoder training is theirs).
# The torch replica runs from the SAME weights (copied from the jax init,
# transposed to torch layout) on the same precomputed memory.

U_DEC = 7          # GO + 5 targets + EOS, equal rows: causal mask only
L_DEC, H_DEC, FF_DEC = 2, 2, 128
SEQ2SEQ_LR = 2e-4


def _torch_decoder_forward(p, mem, dst):
    """Torch replica of TextTransformerDecoder.__call__ (pre-norm stack,
    scale=True, exact gelu, tied-embedding log-softmax in f32) — mirrors
    nn/transformer.py TransformerDecoderLayer._sublayers."""
    import torch
    import torch.nn.functional as TF

    d = p["embedding"].shape[1]
    dh = d // H_DEC
    neg_inf = -1e9  # nn/transformer.py NEG_INF

    def mha(prefix, q_in, k_in, v_in, causal):
        lin = lambda x, n: TF.linear(x, p[prefix + n + ".kernel"].T,
                                     p[prefix + n + ".bias"])
        split = lambda x: x.view(x.shape[0], x.shape[1], H_DEC, dh) \
            .transpose(1, 2)
        q = split(lin(q_in, "w_Q")) / math.sqrt(dh)
        k = split(lin(k_in, "w_K"))
        v = split(lin(v_in, "w_V"))
        logits = q @ k.transpose(-1, -2)
        if causal:
            t = q_in.shape[1]
            keep = torch.tril(torch.ones(t, t, dtype=torch.bool))
            logits = logits.masked_fill(~keep, neg_inf)
        out = torch.softmax(logits, -1) @ v
        out = out.transpose(1, 2).reshape(q_in.shape[0], q_in.shape[1], d)
        return TF.linear(out, p[prefix + "w_O.kernel"].T,
                         p[prefix + "w_O.bias"])

    ln = lambda x, n: TF.layer_norm(x, (d,), p[n + ".scale"],
                                    p[n + ".bias"], eps=1e-5)
    x = p["embedding"][dst] + p["pos_embedding"][: dst.shape[1]]
    for i in range(L_DEC):
        pre = f"layer_{i}."
        x = x + mha(pre + "self_attn.", ln(x, pre + "ln_self"),
                    ln(x, pre + "ln_self"), ln(x, pre + "ln_self"), True)
        h = ln(x, pre + "ln_src")
        x = x + mha(pre + "src_attn.", h, mem, mem, False)
        h = ln(x, pre + "ln_ffn")
        ffn = TF.linear(
            TF.gelu(TF.linear(h, p[pre + "ffn_expand.kernel"].T,
                              p[pre + "ffn_expand.bias"])),
            p[pre + "ffn_contract.kernel"].T, p[pre + "ffn_contract.bias"])
        x = x + ffn
    x = ln(x, "ln_out")
    logits = x.float() @ p["embedding"].T  # tied attend, f32
    return TF.log_softmax(logits, -1)


def _flatten_decoder_params(dec):
    """jax decoder tree -> flat {name: torch.nn.Parameter} for the
    replica above (Dense kernels stay (in, out); the replica transposes)."""
    import torch

    out = {}

    def put(name, arr):
        out[name] = torch.nn.Parameter(
            torch.from_numpy(np.asarray(arr).copy()))

    put("embedding", dec["tgt_embeddings"]["word"]["embedding"])
    put("pos_embedding", dec["tgt_embeddings"]["pos_embedding"])
    tr = dec["transformer"]
    for i in range(L_DEC):
        lyr = tr[f"layer_{i}"]
        pre = f"layer_{i}."
        for attn in ("self_attn", "src_attn"):
            for w in ("w_Q", "w_K", "w_V", "w_O"):
                put(pre + f"{attn}.{w}.kernel", lyr[attn][w]["kernel"])
                put(pre + f"{attn}.{w}.bias", lyr[attn][w]["bias"])
        put(pre + "ffn_expand.kernel", lyr["ffn"]["expand"]["kernel"])
        put(pre + "ffn_expand.bias", lyr["ffn"]["expand"]["bias"])
        put(pre + "ffn_contract.kernel", lyr["ffn"]["contract"]["kernel"])
        put(pre + "ffn_contract.bias", lyr["ffn"]["contract"]["bias"])
        for lname in ("ln_self", "ln_src", "ln_ffn"):
            put(pre + lname + ".scale", lyr[lname]["scale"])
            put(pre + lname + ".bias", lyr[lname]["bias"])
    put("ln_out.scale", tr["ln_out"]["scale"])
    put("ln_out.bias", tr["ln_out"]["bias"])
    return out


@pytest.mark.slow
def test_seq2seq_decoder_dynamics_parity():
    from audio8_tpu.config import DecoderConfig, EncoderConfig
    from audio8_tpu.models.seq2seq import Seq2Seq
    from audio8_tpu.train.steps import make_seq2seq_steps

    Offsets.remap_fairseq_ctc()
    rng = np.random.default_rng(29)
    signal = rng.normal(size=(2, 4000)).astype(np.float32)
    ids = rng.integers(4, V, size=(2, U_DEC)).astype(np.int32)
    ids[:, 0] = Offsets.GO
    ids[:, -1] = Offsets.EOS

    enc_cfg = EncoderConfig(d_model=D, num_heads=H, num_layers=L,
                            custom_conv_features=FX, dropout=0.0,
                            timestep_masking=0.0, channel_masking=0.0)
    dec_cfg = DecoderConfig(vocab_size=V, d_model=D, num_heads=H_DEC,
                            num_layers=L_DEC, d_ff=FF_DEC, dropout=0.0,
                            max_len=64)
    model = Seq2Seq(encoder_config=enc_cfg, decoder_config=dec_cfg)

    batch = {
        "signal": jnp.asarray(signal),
        "signal_lengths": jnp.full((2,), signal.shape[1], jnp.int32),
        "token_ids": jnp.asarray(ids),
        "token_lengths": jnp.full((2,), U_DEC, jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(5), batch["signal"],
                        batch["signal_lengths"], batch["token_ids"][:, :-1],
                        batch["token_lengths"] - 1)["params"]

    # frozen-encoder memory: a constant of the objective (stop_gradient);
    # computed once and shared with the torch side so this differential
    # isolates decoder dynamics (encoder forward parity is certified by
    # the golden-fixture and CTC-dynamics tests)
    memory, _ = model.apply(
        {"params": params}, batch["signal"], batch["signal_lengths"],
        False, method=lambda m, x, xl, tr: m.encoder(x, xl, tr))

    # snapshot the decoder init BEFORE training: update_fn donates the
    # state buffers, deleting the original arrays after step 1
    p = _flatten_decoder_params(
        jax.tree_util.tree_map(np.asarray, params["decoder"]))
    mem_np = np.array(memory)  # writable copy (torch.from_numpy)

    tx = create_optimizer(create_lrs(SEQ2SEQ_LR, N_STEPS,
                                     sched_type="constant", warmup_steps=0),
                          weight_decay=0.0)
    state = TrainState.create(params, tx)
    grad_fn, update_fn, _, _ = make_seq2seq_steps(model, tx, clip=CLIP)

    key = jax.random.PRNGKey(0)  # deterministic: dropout/masking all 0
    o_loss, o_gnorm = [], []
    for _ in range(N_STEPS):
        loss, grads, bsz, _ = grad_fn(state.params, batch, key, freeze=True)
        gnorm = float(jax.tree_util.tree_reduce(
            lambda a, g: a + np.sum(np.square(np.asarray(g, np.float64))),
            grads, 0.0)) ** 0.5 / float(bsz)
        state, _ = update_fn(state, grads, bsz)
        o_loss.append(float(loss))
        o_gnorm.append(gnorm)
    o_loss, o_gnorm = np.array(o_loss), np.array(o_gnorm)

    # torch loop from the SAME decoder weights on the same memory
    import torch
    import torch.nn.functional as TF

    opt = torch.optim.AdamW(p.values(), lr=SEQ2SEQ_LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.0)
    mem_t = torch.from_numpy(mem_np)
    dst = torch.from_numpy(np.asarray(ids[:, :-1]).astype(np.int64))
    tgt = torch.from_numpy(np.asarray(ids[:, 1:]).astype(np.int64))
    b = signal.shape[0]
    t_loss, t_gnorm = [], []
    for _ in range(N_STEPS):
        opt.zero_grad()
        lp = _torch_decoder_forward(p, mem_t, dst)
        nll = -lp.gather(-1, tgt[..., None])[..., 0]
        mask = (tgt != Offsets.PAD).float()
        loss = (nll * mask).sum()
        loss.backward()
        for prm in p.values():
            if prm.grad is not None:
                prm.grad /= b
        gnorm = torch.nn.utils.clip_grad_norm_(p.values(), CLIP)
        opt.step()
        t_loss.append(float(loss.detach()))
        t_gnorm.append(float(gnorm))
    t_loss, t_gnorm = np.array(t_loss), np.array(t_gnorm)

    # glued (measured headroom ~2500x: loss rel <= 4e-7, gnorm <= 7e-7
    # per step on CPU, step-1 loss bit-identical)
    np.testing.assert_allclose(o_loss, t_loss, rtol=1e-3)
    np.testing.assert_allclose(o_gnorm, t_gnorm, rtol=5e-3)
    assert t_loss[-1] < t_loss[0] * 0.9  # training moved the loss
    np.testing.assert_allclose(o_loss[0], t_loss[0], rtol=1e-4)


# ------------------------------------------------------------------ paired
# Fourth objective: the paired CLIP recipe (reference
# pretrain_paired.py:203,250-254 — symmetric InfoNCE with the LEARNABLE
# temperature living in the optimizer via the loss module). At the
# production freeze_audio/freeze_text phase both towers' pooled outputs
# are stop-gradient constants, so the differential isolates the CLIP
# loss + projection + temperature dynamics — including the
# temperature-in-the-train-state subtlety this port handles by making
# logit_scale a loss-module parameter.

PAIRED_LR, OUT_DIM = 2e-3, 16


@pytest.mark.slow
def test_paired_clip_dynamics_parity():
    import torch

    from audio8_tpu.config import PooledConfig, TextEncoderConfig
    from audio8_tpu.models.dual_encoder import (DualEncoderModel,
                                                SymmetricCLIPLoss)
    from audio8_tpu.train.steps import make_paired_steps

    Offsets.remap_fairseq_ctc()
    rng = np.random.default_rng(31)
    signal = rng.normal(size=(2, 4000)).astype(np.float32)
    ids = rng.integers(4, V, size=(2, 6)).astype(np.int32)
    batch = {
        "signal": jnp.asarray(signal),
        "signal_lengths": jnp.full((2,), signal.shape[1], jnp.int32),
        "token_ids": jnp.asarray(ids),
        "token_lengths": jnp.full((2,), ids.shape[1], jnp.int32),
    }

    a_cfg = PooledConfig(d_model=D, num_heads=H, num_layers=L,
                         custom_conv_features=FX, dropout=0.0,
                         timestep_masking=0.0, channel_masking=0.0,
                         reduction_type="mean")
    t_cfg = TextEncoderConfig(vocab_size=V, d_model=24, encoder_type="bow",
                              reduction_type="mean", dropout=0.0)
    model = DualEncoderModel(audio_config=a_cfg, text_config=t_cfg,
                             stacking_layers=(), output_dim=OUT_DIM)
    loss_module = SymmetricCLIPLoss(init_temperature=0.07,
                                    learn_temperature=True)

    mp = model.init(jax.random.PRNGKey(3), batch["signal"],
                    batch["signal_lengths"], batch["token_ids"],
                    batch["token_lengths"])["params"]
    dummy = jnp.zeros((2, OUT_DIM), jnp.float32)
    lp = loss_module.init(jax.random.PRNGKey(1), dummy, dummy)["params"]
    params = {"model": mp, "loss": lp}

    # frozen pooled towers: constants of the objective under
    # freeze_audio=freeze_text=True (stop_gradient before the
    # projections; reduction 'mean'/BoW have no params)
    a_pool = np.array(model.apply(
        {"params": mp}, batch["signal"], batch["signal_lengths"], True,
        True, method=lambda m, x, xl, tr, fr: m.audio_encoder(x, xl, tr, fr)))
    t_pool = np.array(model.apply(
        {"params": mp}, batch["token_ids"], batch["token_lengths"], True,
        True, method=lambda m, i, il, tr, fr: m.text_encoder(i, il, tr, fr)))
    # snapshot trainable weights before the donating update loop
    snap = jax.tree_util.tree_map(np.asarray, {
        "ak": mp["audio_proj"]["out"]["kernel"],
        "ab": mp["audio_proj"]["out"]["bias"],
        "tk": mp["text_proj"]["out"]["kernel"],
        "tb": mp["text_proj"]["out"]["bias"],
        "ls": lp["logit_scale"],
    })

    tx = create_optimizer(create_lrs(PAIRED_LR, N_STEPS,
                                     sched_type="constant", warmup_steps=0),
                          weight_decay=0.0)
    state = TrainState.create(params, tx)
    grad_fn, update_fn, _ = make_paired_steps(model, loss_module, tx,
                                              clip=CLIP)
    key = jax.random.PRNGKey(0)
    o_loss, o_gnorm = [], []
    for _ in range(N_STEPS):
        loss, _, grads, bsz, _ = grad_fn(state.params, batch, key,
                                         freeze_audio=True,
                                         freeze_text=True)
        gnorm = float(jax.tree_util.tree_reduce(
            lambda a, g: a + np.sum(np.square(np.asarray(g, np.float64))),
            grads, 0.0)) ** 0.5 / float(bsz)
        state, _ = update_fn(state, grads, bsz)
        o_loss.append(float(loss))
        o_gnorm.append(gnorm)
    o_loss, o_gnorm = np.array(o_loss), np.array(o_gnorm)

    # torch loop: projections + logit_scale from the same weights on the
    # same pooled constants (CLIP semantics of SymmetricCLIPLoss:
    # clamp-min 1e-8 normalization, all rows valid)
    p = {k: torch.nn.Parameter(torch.from_numpy(np.array(v)))
         for k, v in snap.items()}
    opt = torch.optim.AdamW(p.values(), lr=PAIRED_LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.0)
    ap = torch.from_numpy(a_pool)
    tp = torch.from_numpy(t_pool)
    b = signal.shape[0]
    t_loss, t_gnorm = [], []
    for _ in range(N_STEPS):
        opt.zero_grad()
        a = ap @ p["ak"] + p["ab"]
        t = tp @ p["tk"] + p["tb"]
        a = a / torch.clamp(a.norm(dim=-1, keepdim=True), min=1e-8)
        t = t / torch.clamp(t.norm(dim=-1, keepdim=True), min=1e-8)
        logits = torch.exp(p["ls"]) * (a @ t.T)
        diag = torch.diagonal(logits)
        loss_a = (torch.logsumexp(logits, dim=-1) - diag).mean()
        loss_t = (torch.logsumexp(logits, dim=0) - diag).mean()
        loss = 0.5 * (loss_a + loss_t)
        loss.backward()
        for prm in p.values():
            if prm.grad is not None:
                prm.grad /= b
        gnorm = torch.nn.utils.clip_grad_norm_(p.values(), CLIP)
        opt.step()
        t_loss.append(float(loss.detach()))
        t_gnorm.append(float(gnorm))
    t_loss, t_gnorm = np.array(t_loss), np.array(t_gnorm)

    # glued (measured headroom: loss rel <= 4e-7, gnorm <= 6e-6/step)
    np.testing.assert_allclose(o_loss, t_loss, rtol=1e-3)
    np.testing.assert_allclose(o_gnorm, t_gnorm, rtol=5e-3)
    assert t_loss[-1] < t_loss[0] * 0.9  # the CLIP objective trains
    np.testing.assert_allclose(o_loss[0], t_loss[0], rtol=1e-4)
