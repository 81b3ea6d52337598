"""Jitted training/eval step factories for the four workloads.

Each factory closes over the model + optimizer and returns jit-compiled
functions. Data-dependent values (token counts, batch sizes) stay dynamic;
phase changes (freeze/unfreeze at unfreeze_enc_after_step,
/root/reference/audio8/train.py:296-297) are static arguments, costing one
recompile at the boundary instead of per-step Python branching.

Gradient accumulation follows the reference semantics
(/root/reference/audio8/train.py:300-326): accumulate grads and counts over
micro-steps, then scale the summed gradient by 1/total_examples, clip by
global norm, and step. Under pjit the DDP allreduce of counters+grads is
just XLA collectives over the 'data' mesh axis.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from audio8_tpu.config import START_TEMP, END_TEMP, TEMP_DECAY_FACTOR
from audio8_tpu.models.wav2vec2 import wav2vec2_pretrain_loss
from audio8_tpu.ops.ctc import ctc_loss
from audio8_tpu.utils import Offsets


def _mesh_wrap(fn, mesh):
    """Run ``fn`` under the mesh context so bare-PartitionSpec sharding
    constraints (``sequence_parallel``) resolve at trace time. Identity
    when mesh is None; entering the context on post-compile dispatches is
    a few microseconds."""
    if mesh is None:
        return fn

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with mesh:
            return fn(*args, **kwargs)

    return wrapped


def moe_aux_weight(model) -> float:
    """The MoE load-balance loss weight, 0.0 for dense models. MoE layers
    sow their Switch aux loss into the 'losses' collection (nn/moe.py);
    every factory adds ``weight * sum(sowed)`` to its objective
    (``audio_config`` covers the dual-encoder's audio tower)."""
    for name in ("config", "encoder_config", "audio_config"):
        cfg = getattr(model, name, None)
        if cfg is not None and getattr(cfg, "moe_experts", 0) > 0:
            return float(getattr(cfg, "moe_aux_weight", 0.0))
    return 0.0


def sum_sowed_losses(mutated) -> jnp.ndarray:
    return sum((jnp.sum(v) for v in
                jax.tree_util.tree_leaves(mutated.get("losses", {}))),
               jnp.zeros((), jnp.float32))


def apply_collecting_aux(model, variables, *args, aux_w: float, **kwargs):
    """``model.apply`` that also returns the sowed MoE load-balance loss
    (a traced scalar when ``aux_w > 0``, literal 0.0 for dense models so
    XLA sees no extra collection plumbing)."""
    if aux_w > 0.0:
        out, mut = model.apply(variables, *args, mutable=["losses"],
                               **kwargs)
        return out, sum_sowed_losses(mut)
    return model.apply(variables, *args, **kwargs), 0.0


def clean_targets(targets: jnp.ndarray, token_lengths: jnp.ndarray):
    """Drop PAD/EOS from CTC targets (reference CTCLoss masks them,
    /root/reference/audio8/ctc.py:193-194). PAD/EOS only occur as suffix in
    this pipeline, so adjusting lengths suffices; padded tail is set PAD."""
    keep = (targets != Offsets.PAD) & (targets != Offsets.EOS)
    lengths = jnp.sum(keep, axis=-1)
    return targets, lengths


def row_validity(batch) -> jnp.ndarray:
    """1.0 for real rows, 0.0 for padding rows added by batch-size snapping
    (datasets mark them with signal_lengths == 0). Losses weight rows by
    this so padded rows contribute exactly zero loss and gradient."""
    return (batch["signal_lengths"] > 0).astype(jnp.float32)


def current_temperature(step: jnp.ndarray, start=START_TEMP, end=END_TEMP,
                        decay=TEMP_DECAY_FACTOR) -> jnp.ndarray:
    """Gumbel temperature anneal (wav2vec2.py:495-496). NOTE: the reference
    driver never calls set_num_updates so its temperature stays at START
    (SURVEY.md quirks); we anneal properly."""
    return jnp.maximum(start * decay ** step.astype(jnp.float32), end)


# --------------------------------------------------------------------- CTC


def make_ctc_steps(model, tx: optax.GradientTransformation, clip: float = 25.0,
                   loss_reduction: str = "sum", mesh=None):
    """Returns (grad_fn, update_fn, eval_fn) for CTC fine-tuning.

    ``mesh``: required when the model has ``sequence_parallel=True`` so
    the trace sees the mesh context (otherwise optional).

    The returned tuple also exposes ``grad_fn.train_step``: a single fused
    grad+update program for the no-accumulation case — one dispatch per
    step instead of two, which matters when per-program launch overhead is
    comparable to device time (short frozen-encoder steps; remote-relay
    dispatch)."""

    def _masked_ctc(log_probs, frame_lengths, targets, target_lengths, rows):
        per_row = ctc_loss(log_probs, frame_lengths, targets, target_lengths,
                           blank=Offsets.GO, reduction="none")
        if loss_reduction == "sum":
            return jnp.sum(per_row * rows)
        per = per_row / jnp.maximum(target_lengths.astype(jnp.float32), 1.0)
        return jnp.sum(per * rows) / jnp.maximum(jnp.sum(rows), 1.0)

    def _grad_impl(params, batch, rng, freeze: bool = True):
        signal = batch["signal"]
        signal_lengths = batch["signal_lengths"]
        targets, target_lengths = clean_targets(batch["token_ids"], batch["token_lengths"])
        rows = row_validity(batch)

        def loss_fn(p):
            rngs = {"dropout": jax.random.fold_in(rng, 0),
                    "mask": jax.random.fold_in(rng, 1)}
            aux_w = moe_aux_weight(model)
            (log_probs, pad_mask), aux = apply_collecting_aux(
                model, {"params": p}, signal, signal_lengths, aux_w=aux_w,
                train=True, freeze=freeze, rngs=rngs)
            frame_lengths = jnp.sum(pad_mask, axis=-1)
            loss = _masked_ctc(log_probs, frame_lengths, targets,
                               target_lengths, rows)
            # scale by the example count so the per-example aux weight
            # survives update_fn's 1/total_examples gradient scaling
            loss = loss + aux_w * aux * jnp.maximum(jnp.sum(rows), 1.0)
            return loss, {}

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        batch_size = jnp.sum(rows)
        num_tokens = jnp.sum(target_lengths * rows).astype(jnp.float32)
        return loss, grads, batch_size, num_tokens

    grad_fn = jax.jit(_grad_impl, static_argnames=("freeze",))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def update_fn(state, grads, total_examples):
        # scale_grads(num_gpus / batch_size) after DDP mean == divide the
        # summed gradient by the global example count (train.py:323)
        return state.apply_gradients(
            grads, tx, grad_scale=1.0 / jnp.maximum(total_examples, 1.0),
            clip_norm=clip)

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("freeze",))
    def train_step(state, batch, rng, freeze: bool = True):
        loss, grads, bsz, toks = _grad_impl(state.params, batch, rng, freeze)
        new_state, _ = state.apply_gradients(
            grads, tx, grad_scale=1.0 / jnp.maximum(bsz, 1.0),
            clip_norm=clip)
        return new_state, loss, bsz, toks

    @jax.jit
    def eval_fn(params, batch):
        signal = batch["signal"]
        signal_lengths = batch["signal_lengths"]
        targets, target_lengths = clean_targets(batch["token_ids"], batch["token_lengths"])
        log_probs, pad_mask = model.apply(
            {"params": params}, signal, signal_lengths, train=False, freeze=True)
        frame_lengths = jnp.sum(pad_mask, axis=-1)
        loss = _masked_ctc(log_probs, frame_lengths, targets, target_lengths,
                           row_validity(batch))
        frames = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
        return loss, frames, frame_lengths

    grad_fn, eval_fn = _mesh_wrap(grad_fn, mesh), _mesh_wrap(eval_fn, mesh)
    grad_fn.train_step = _mesh_wrap(train_step, mesh)
    return grad_fn, update_fn, eval_fn


# ---------------------------------------------------------------- pretrain


def make_pretrain_steps(model, tx: optax.GradientTransformation,
                        clip: float = 1.0, n_negatives: int = 100, mesh=None):
    cfg = model.config
    n_vars = cfg.num_vq_vars * cfg.num_vq_groups

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, signal, rng):
        temp = current_temperature(state.step, cfg.start_temp, cfg.end_temp,
                                   cfg.temp_decay_factor)

        def loss_fn(p):
            rngs = {"dropout": jax.random.fold_in(rng, 0),
                    "mask": jax.random.fold_in(rng, 1),
                    "gumbel": jax.random.fold_in(rng, 2)}
            aux_w = moe_aux_weight(model)
            (c, t, ppl, valid), aux = apply_collecting_aux(
                model, {"params": p}, signal, aux_w=aux_w, train=True,
                temperature=temp, rngs=rngs)
            loss, metrics = wav2vec2_pretrain_loss(
                c, t, ppl, valid, jax.random.fold_in(rng, 3), n_vars,
                n_negatives)
            if aux_w > 0.0:
                loss = loss + aux_w * aux
                metrics = dict(metrics, moe_aux=aux)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state, gnorm = state.apply_gradients(grads, tx, clip_norm=clip)
        metrics = dict(metrics, loss=loss, grad_norm=gnorm, temperature=temp)
        return new_state, metrics

    @jax.jit
    def eval_step(params, signal, rng, step):
        temp = current_temperature(step, cfg.start_temp, cfg.end_temp,
                                   cfg.temp_decay_factor)
        rngs = {"mask": jax.random.fold_in(rng, 1),
                "gumbel": jax.random.fold_in(rng, 2)}
        c, t, ppl, valid = model.apply(
            {"params": params}, signal, train=False, temperature=temp, rngs=rngs)
        loss, metrics = wav2vec2_pretrain_loss(
            c, t, ppl, valid, jax.random.fold_in(rng, 3), n_vars, n_negatives)
        return loss, metrics

    return _mesh_wrap(train_step, mesh), _mesh_wrap(eval_step, mesh)


# ---------------------------------------------------------------- data2vec


def make_data2vec_steps(model, tx: optax.GradientTransformation,
                        clip: float = 1.0):
    """(train_step, eval_fn) for data2vec masked-regression pretraining
    (models/data2vec.py). ``train_step(state, teacher, batch, rng)``
    returns (state, teacher, metrics): the student updates by gradient,
    the teacher by an annealed EMA of the updated student — one jitted
    program per step."""
    from audio8_tpu.models.data2vec import (
        data2vec_loss, data2vec_targets, ema_decay_schedule, ema_update)

    cfg = model.config
    aux_w = moe_aux_weight(model)

    def _loss(params, teacher, signal, lengths, rng, train):
        rngs = {"dropout": jax.random.fold_in(rng, 0),
                "mask": jax.random.fold_in(rng, 1)}
        # MoE aux collects from the student pass only (the teacher is a
        # stop-gradient EMA; its routing shouldn't shape the student's
        # load-balance objective)
        (pred, time_mask, pad_mask), aux = apply_collecting_aux(
            model, {"params": params}, signal, lengths, aux_w=aux_w,
            train=train, rngs=rngs)
        hiddens, _, _ = model.apply(
            {"params": jax.lax.stop_gradient(teacher)}, signal, lengths,
            train=False, mask=False, collect_hiddens=True)
        target = data2vec_targets(hiddens, cfg.average_top_k_layers)
        loss, metrics = data2vec_loss(pred, target, time_mask, pad_mask)
        if aux_w > 0.0:
            loss = loss + aux_w * aux
            metrics = dict(metrics, moe_aux=aux)
        return loss, metrics

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(state, teacher, batch, rng):
        signal = batch["signal"]
        lengths = batch.get("signal_lengths")

        (loss, metrics), grads = jax.value_and_grad(
            lambda p: _loss(p, teacher, signal, lengths, rng, True),
            has_aux=True)(state.params)
        new_state, gnorm = state.apply_gradients(grads, tx, clip_norm=clip)
        decay = ema_decay_schedule(new_state.step, cfg.ema_decay,
                                   cfg.ema_end_decay, cfg.ema_anneal_steps)
        teacher = ema_update(teacher, new_state.params, decay)
        metrics = dict(metrics, loss=loss, grad_norm=gnorm, ema_decay=decay)
        return new_state, teacher, metrics

    @jax.jit
    def eval_fn(params, teacher, batch, rng):
        return _loss(params, teacher, batch["signal"],
                     batch.get("signal_lengths"), rng, False)

    return train_step, eval_fn


# ------------------------------------------------------------------ hubert


def make_hubert_steps(model, tx: optax.GradientTransformation,
                      clip: float = 1.0):
    """(train_step, eval_fn) for HuBERT masked-prediction pretraining
    (models/hubert.py). Batches are the supervised pipeline's dicts with
    ``token_ids`` = frame cluster ids (TGT_KM, padded -1); padded rows
    (signal_lengths == 0) contribute nothing because their pad mask is
    empty."""
    from audio8_tpu.models.hubert import hubert_pretrain_loss

    cfg = model.config
    aux_w = moe_aux_weight(model)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        signal = batch["signal"]
        signal_lengths = batch["signal_lengths"]

        def loss_fn(p):
            rngs = {"dropout": jax.random.fold_in(rng, 0),
                    "mask": jax.random.fold_in(rng, 1)}
            (logits, time_mask, pad_mask), aux = apply_collecting_aux(
                model, {"params": p}, signal, signal_lengths, aux_w=aux_w,
                train=True, rngs=rngs)
            loss, metrics = hubert_pretrain_loss(
                logits, time_mask, pad_mask, batch["token_ids"],
                batch["token_lengths"], cfg.pred_masked_weight,
                cfg.pred_unmasked_weight)
            if aux_w > 0.0:
                loss = loss + aux_w * aux
                metrics = dict(metrics, moe_aux=aux)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state, gnorm = state.apply_gradients(grads, tx, clip_norm=clip)
        metrics = dict(metrics, loss=loss, grad_norm=gnorm)
        return new_state, metrics

    @jax.jit
    def eval_fn(params, batch, rng):
        logits, time_mask, pad_mask = model.apply(
            {"params": params}, batch["signal"], batch["signal_lengths"],
            train=False, rngs={"mask": jax.random.fold_in(rng, 1)})
        loss, metrics = hubert_pretrain_loss(
            logits, time_mask, pad_mask, batch["token_ids"],
            batch["token_lengths"], cfg.pred_masked_weight,
            cfg.pred_unmasked_weight)
        return loss, metrics

    return train_step, eval_fn


# ---------------------------------------------------------------- seq2seq


def sequence_loss(log_probs: jnp.ndarray, targets: jnp.ndarray,
                  reduction: str = "sum") -> jnp.ndarray:
    """NLL over non-PAD target positions (eight_mile SequenceLoss equiv)."""
    nll = -jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    mask = (targets != Offsets.PAD).astype(jnp.float32)
    total = jnp.sum(nll * mask)
    if reduction == "sum":
        return total
    return total / jnp.maximum(jnp.sum(mask), 1.0)  # 'token'


def make_seq2seq_steps(model, tx: optax.GradientTransformation,
                       clip: float = 25.0, loss_reduction: str = "sum"):
    aux_w = moe_aux_weight(model)

    @functools.partial(jax.jit, static_argnames=("freeze",))
    def grad_fn(params, batch, rng, freeze: bool = True):
        signal = batch["signal"]
        signal_lengths = batch["signal_lengths"]
        rows = row_validity(batch)
        # teacher forcing: shift targets (train_seq2seq.py:100-105); padding
        # rows have token_lengths == 0 -> clamp, and their all-PAD targets
        # already zero out of sequence_loss
        dst = batch["token_ids"][:, :-1]
        tgt = batch["token_ids"][:, 1:]
        dst_lengths = jnp.maximum(batch["token_lengths"] - 1, 0)

        def loss_fn(p):
            rngs = {"dropout": jax.random.fold_in(rng, 0),
                    "mask": jax.random.fold_in(rng, 1)}
            log_probs, aux = apply_collecting_aux(
                model, {"params": p}, signal, signal_lengths, dst,
                dst_lengths, aux_w=aux_w, train=True, freeze=freeze,
                rngs=rngs)
            loss = sequence_loss(log_probs, tgt, loss_reduction)
            # scale by the example count so the per-example aux weight
            # survives update_fn's 1/total_examples gradient scaling
            loss = loss + aux_w * aux * jnp.maximum(jnp.sum(rows), 1.0)
            return loss, {}

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        batch_size = jnp.sum(rows)
        num_tokens = jnp.sum(dst_lengths * rows).astype(jnp.float32)
        return loss, grads, batch_size, num_tokens

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def update_fn(state, grads, total_examples):
        return state.apply_gradients(
            grads, tx, grad_scale=1.0 / jnp.maximum(total_examples, 1.0),
            clip_norm=clip)

    @functools.partial(jax.jit, static_argnames=("max_output_len", "beam"))
    def decode_fn(params, batch, max_output_len: int = 100, beam: int = 1):
        if beam > 1:
            return model.apply(
                {"params": params}, batch["signal"], batch["signal_lengths"],
                beam, max_output_len, method=type(model).decode_beam)
        toks, lengths = model.apply(
            {"params": params}, batch["signal"], batch["signal_lengths"],
            max_output_len, method=type(model).decode)
        return toks, lengths

    @jax.jit
    def eval_loss_fn(params, batch):
        dst = batch["token_ids"][:, :-1]
        tgt = batch["token_ids"][:, 1:]
        dst_lengths = jnp.maximum(batch["token_lengths"] - 1, 0)
        log_probs = model.apply(
            {"params": params}, batch["signal"], batch["signal_lengths"],
            dst, dst_lengths, train=False, freeze=True)
        return sequence_loss(log_probs, tgt, loss_reduction)

    return grad_fn, update_fn, decode_fn, eval_loss_fn


# ------------------------------------------------------------------ paired


def make_paired_steps(model, loss_module, tx: optax.GradientTransformation,
                      clip: float = 25.0):
    """Dual-encoder CLIP training; params = {'model': ..., 'loss': ...} so
    the temperature trains with everything else (the reference wraps the
    loss module in the optimizer for this, pretrain_paired.py:250-254)."""
    aux_w = moe_aux_weight(model)

    @functools.partial(jax.jit, static_argnames=("freeze_audio", "freeze_text"))
    def grad_fn(params, batch, rng, freeze_audio: bool = True, freeze_text: bool = True):
        rows = row_validity(batch)

        def loss_fn(p):
            rngs = {"dropout": jax.random.fold_in(rng, 0),
                    "mask": jax.random.fold_in(rng, 1)}
            (a, t), aux = apply_collecting_aux(
                model, {"params": p["model"]}, batch["signal"],
                batch["signal_lengths"], batch["token_ids"],
                batch["token_lengths"], aux_w=aux_w, train=True,
                freeze_audio=freeze_audio, freeze_text=freeze_text,
                rngs=rngs)
            loss, metrics = loss_module.apply({"params": p["loss"]}, a, t, rows)
            if aux_w > 0.0:
                # survives update_fn's 1/total_examples gradient scaling
                loss = loss + aux_w * aux * jnp.maximum(jnp.sum(rows), 1.0)
                metrics = dict(metrics, moe_aux=aux)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        batch_size = jnp.sum(rows)
        num_tokens = jnp.sum(batch["token_lengths"] * rows).astype(jnp.float32)
        return loss, metrics, grads, batch_size, num_tokens

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def update_fn(state, grads, total_examples):
        return state.apply_gradients(
            grads, tx, grad_scale=1.0 / jnp.maximum(total_examples, 1.0),
            clip_norm=clip)

    @jax.jit
    def eval_fn(params, batch):
        a, t = model.apply(
            {"params": params["model"]}, batch["signal"], batch["signal_lengths"],
            batch["token_ids"], batch["token_lengths"], train=False)
        return loss_module.apply({"params": params["loss"]}, a, t,
                                 row_validity(batch))

    return grad_fn, update_fn, eval_fn


def accumulate_grads(acc, grads):
    """Elementwise add of gradient pytrees (grad-accum buffer)."""
    if acc is None:
        return grads
    return jax.tree_util.tree_map(jnp.add, acc, grads)


# -------------------------------------------------------------- transducer


def make_transducer_steps(model, tx: optax.GradientTransformation,
                          clip: float = 25.0, loss_reduction: str = "sum",
                          mesh=None, fused_loss: bool = False):
    """(grad_fn, update_fn, decode_fn, eval_loss_fn) for RNN-T training
    (models/transducer.Transducer + ops/transducer.transducer_loss).

    Same conventions as make_ctc_steps: blank = Offsets.GO, 'sum' loss
    scaled by 1/total_examples at update, freeze as a static arg, fused
    ``grad_fn.train_step`` for grad_accum == 1, padding rows weighted out
    by row_validity.
    """
    from audio8_tpu.ops.transducer import transducer_loss

    aux_w = moe_aux_weight(model)

    def _masked_loss(log_probs, frame_lengths, targets, target_lengths, rows):
        per_row = transducer_loss(log_probs, frame_lengths, targets,
                                  target_lengths, blank=Offsets.GO,
                                  reduction="none", fused=fused_loss)
        if loss_reduction == "sum":
            return jnp.sum(per_row * rows)
        per = per_row / jnp.maximum(target_lengths.astype(jnp.float32), 1.0)
        return jnp.sum(per * rows) / jnp.maximum(jnp.sum(rows), 1.0)

    def _grad_impl(params, batch, rng, freeze: bool = True):
        signal = batch["signal"]
        signal_lengths = batch["signal_lengths"]
        targets, target_lengths = clean_targets(batch["token_ids"],
                                                batch["token_lengths"])
        rows = row_validity(batch)

        def loss_fn(p):
            rngs = {"dropout": jax.random.fold_in(rng, 0),
                    "mask": jax.random.fold_in(rng, 1)}
            (log_probs, pad_mask), aux = apply_collecting_aux(
                model, {"params": p}, signal, signal_lengths, targets,
                aux_w=aux_w, train=True, freeze=freeze, rngs=rngs)
            frame_lengths = jnp.sum(pad_mask, axis=-1)
            loss = _masked_loss(log_probs, frame_lengths, targets,
                                target_lengths, rows)
            # survives update_fn's 1/total_examples gradient scaling
            loss = loss + aux_w * aux * jnp.maximum(jnp.sum(rows), 1.0)
            return loss, {}

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        batch_size = jnp.sum(rows)
        num_tokens = jnp.sum(target_lengths * rows).astype(jnp.float32)
        return loss, grads, batch_size, num_tokens

    grad_fn = jax.jit(_grad_impl, static_argnames=("freeze",))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def update_fn(state, grads, total_examples):
        return state.apply_gradients(
            grads, tx, grad_scale=1.0 / jnp.maximum(total_examples, 1.0),
            clip_norm=clip)

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("freeze",))
    def train_step(state, batch, rng, freeze: bool = True):
        loss, grads, bsz, toks = _grad_impl(state.params, batch, rng, freeze)
        new_state, _ = state.apply_gradients(
            grads, tx, grad_scale=1.0 / jnp.maximum(bsz, 1.0),
            clip_norm=clip)
        return new_state, loss, bsz, toks

    @functools.partial(jax.jit,
                       static_argnames=("max_output_len", "max_symbols",
                                        "beam"))
    def decode_fn(params, batch, max_output_len: int = 200,
                  max_symbols: int = 4, beam: int = 1):
        if beam > 1:  # validation beam: 1-best of the sorted beams
            toks, n, _ = model.apply(
                {"params": params}, batch["signal"],
                batch["signal_lengths"], beam, max_output_len,
                max_symbols, method=type(model).decode_beam)
            return toks[:, 0], n[:, 0]
        return model.apply(
            {"params": params}, batch["signal"], batch["signal_lengths"],
            max_output_len, max_symbols, method=type(model).decode)

    @jax.jit
    def eval_loss_fn(params, batch):
        targets, target_lengths = clean_targets(batch["token_ids"],
                                                batch["token_lengths"])
        log_probs, pad_mask = model.apply(
            {"params": params}, batch["signal"], batch["signal_lengths"],
            targets, train=False, freeze=True)
        frame_lengths = jnp.sum(pad_mask, axis=-1)
        return _masked_loss(log_probs, frame_lengths, targets,
                            target_lengths, row_validity(batch))

    grad_fn, decode_fn = _mesh_wrap(grad_fn, mesh), _mesh_wrap(decode_fn, mesh)
    eval_loss_fn = _mesh_wrap(eval_loss_fn, mesh)
    grad_fn.train_step = _mesh_wrap(train_step, mesh)
    return grad_fn, update_fn, decode_fn, eval_loss_fn


# ---------------------------------------------------------------- text LM


def make_lm_steps(model, tx: optax.GradientTransformation, clip: float = 1.0):
    """(train_step, eval_fn) for causal text-LM training (a8t-train-lm;
    models/text.CausalTextLM). Batches: ``{"ids": (B, L+1) int32}``
    packed token blocks — position t predicts t+1; PAD targets (the tail
    of the final partial block) are masked out of the token-mean NLL."""
    from audio8_tpu.utils import Offsets

    pad = Offsets.PAD

    def _nll(params, ids, train, rng=None):
        rngs = {"dropout": rng} if rng is not None else None
        lp = model.apply({"params": params}, ids[:, :-1], train=train,
                         rngs=rngs)
        tgt = ids[:, 1:]
        tok_lp = jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        valid = (tgt != pad).astype(jnp.float32)
        n = jnp.maximum(jnp.sum(valid), 1.0)
        return -jnp.sum(tok_lp * valid) / n, n

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        def loss_fn(p):
            return _nll(p, batch["ids"], True, rng)

        (loss, ntok), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state, gnorm = state.apply_gradients(grads, tx, clip_norm=clip)
        return new_state, {"loss": loss, "tokens": ntok, "grad_norm": gnorm}

    @jax.jit
    def eval_fn(params, batch):
        return _nll(params, batch["ids"], False)

    return train_step, eval_fn
