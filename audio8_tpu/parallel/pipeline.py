"""Pipeline parallelism (GPipe schedule) for the transformer stack.

The reference has no pipeline story (pure DDP,
/root/reference/audio8/train.py:261-268 "this program assume pure data
parallelism"); this is the TPU-native extension that completes the
parallelism menu (DP / TP / SP / ZeRO-1 / PP). The design is the SPMD
collective-pipelining recipe:

- the stack's per-layer param trees are STACKED on a leading (L, ...)
  axis and sharded ``P('pipe')`` — each of the S pipeline stages holds
  L/S consecutive layers;
- activations are split into M microbatches; inside one
  ``jax.shard_map`` over a ``('pipe', 'data')`` mesh every stage runs
  the same program for M+S-1 ticks, applying its local layers
  (``lax.scan``) and handing its output to the next stage with
  ``lax.ppermute`` over the ICI ring;
- the last stage's outputs are collected per-tick and ``psum``-ed over
  'pipe' at the end (all other stages contribute zeros), so the result
  is replicated and the surrounding program (CTC head + loss) stays a
  plain pjit program. Gradients flow back through the ppermute chain
  (its transpose is the reverse ring), and shard_map's transpose inserts
  the 'data'-axis psums for the replicated non-layer params — the same
  DDP-equivalent synchronization as the DP path.

Bubble fraction is the GPipe (S-1)/(M+S-1); raise ``n_micro`` to
amortize. Numerics match the sequential stack exactly in deterministic
mode (tests/test_pipeline_parallel.py); under training, dropout draws a
different (but valid) per-(layer, microbatch) stream.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio8_tpu.nn.transformer import TransformerEncoderLayer


def make_pp_mesh(pipe: int, data: int = -1, devices=None) -> Mesh:
    """Build a ('pipe', 'data') mesh; data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % pipe != 0:
            raise ValueError(f"pipe extent {pipe} does not divide {n} devices")
        data = n // pipe
    if pipe * data != n:
        raise ValueError(f"mesh {pipe}x{data} != {n} devices")
    arr = np.asarray(devices).reshape(pipe, data)
    return Mesh(arr, ("pipe", "data"))


def stack_layer_params(params: Any, num_layers: int, prefix: str = "layer_") -> Any:
    """Stack a stack-subtree's per-layer param trees ({layer_0: .., ..})
    into one tree with (L, ...) leaves. Differentiable (jnp.stack), so
    calling it inside the loss routes gradients back to the per-layer
    leaves of the canonical tree."""
    layers = [params[f"{prefix}{i}"] for i in range(num_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def pipeline_layers(layer_module, stacked_params, xs, masks, mesh: Mesh,
                    *, train: bool = False, rng=None):
    """Run M microbatches through L stacked transformer layers with a
    GPipe schedule over the mesh's 'pipe' axis.

    - ``stacked_params``: tree with (L, ...) leaves (stack_layer_params)
    - ``xs``: (M, B, T, C) microbatched activations
    - ``masks``: (M, B, 1, 1, T) attention masks (bool)
    Returns (M, B, T, C), replicated over 'pipe', batch-sharded on 'data'.
    """
    n_stages = mesh.shape["pipe"]
    n_micro = xs.shape[0]
    num_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if num_layers % n_stages:
        raise ValueError(f"{num_layers} layers not divisible by "
                         f"{n_stages} pipeline stages")
    local_l = num_layers // n_stages
    shift = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    det = not train
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # materialize each stage's local slice only (the canonical tree is
    # replicated; this keeps the stacked copy at 1/S per device)
    stacked_params = jax.lax.with_sharding_constraint(
        stacked_params, NamedSharding(mesh, P("pipe")))

    def stage_fn(params, xs, masks, key):
        stage = jax.lax.axis_index("pipe")
        lidx0 = stage * local_l
        buf = jnp.zeros_like(xs[0])
        buf_mask = jnp.zeros_like(masks[0])
        out = jnp.zeros_like(xs)

        def run_stage(x, mask, t):
            def body(carry, sl):
                p, li = sl
                rngs = (None if det else
                        {"dropout": jax.random.fold_in(
                            jax.random.fold_in(key, t), li)})
                y = layer_module.apply({"params": p}, carry, mask, det,
                                       rngs=rngs)
                return y, None

            y, _ = jax.lax.scan(
                body, x, (params, lidx0 + jnp.arange(local_l)))
            return y

        for t in range(n_micro + n_stages - 1):
            feed = min(t, n_micro - 1)
            x_in = jnp.where(stage == 0, xs[feed], buf)
            m_in = jnp.where(stage == 0, masks[feed], buf_mask)
            y = run_stage(x_in, m_in, t)
            m = t - (n_stages - 1)
            if 0 <= m < n_micro:
                out = out.at[m].set(
                    jnp.where(stage == n_stages - 1, y, jnp.zeros_like(y)))
            buf = jax.lax.ppermute(y, "pipe", shift)
            buf_mask = jax.lax.ppermute(m_in, "pipe", shift)
        # only the last stage wrote non-zeros; sum replicates the result
        return jax.lax.psum(out, "pipe")

    return jax.shard_map(
        stage_fn, mesh=mesh,
        in_specs=(P("pipe"), P(None, "data"), P(None, "data"), P()),
        out_specs=P(None, "data"))(stacked_params, xs, masks, rng)


def make_pp_ctc_steps(model, tx, mesh: Mesh, n_micro: int,
                      clip: float = 25.0, loss_reduction: str = "sum"):
    """(train_step, eval_fn) for CTC fine-tuning with the transformer
    stack pipelined over the mesh's 'pipe' axis (GPipe) and the batch
    sharded over 'data'. The conv extractor / projection / CTC head run
    data-parallel replicated, exactly like the reference's DDP modules.

    Constraints (asserted): post-norm transformer stack, no WavLM bias,
    no layer drop, no sequence_parallel; ``freeze`` is unsupported —
    pipelining exists to TRAIN the stack (freeze + PP would pipeline a
    forward that needs no sync)."""
    import optax  # noqa: F401  (parity with train.steps factory imports)

    from audio8_tpu.ops.ctc import ctc_loss
    from audio8_tpu.train.steps import clean_targets, row_validity
    from audio8_tpu.utils import Offsets

    cfg = model.config
    assert cfg.encoder_type == "transformer", "PP: transformer stacks only"
    assert not cfg.pre_norm, "PP: post-norm stacks only (no shared ln_out)"
    assert not cfg.gated_rel_pos, "PP: WavLM shared bias unsupported"
    assert cfg.layer_drop == 0.0, "PP: layer drop unsupported"
    assert not cfg.sequence_parallel, "PP: combine with SP not supported"
    assert getattr(cfg, "moe_experts", 0) == 0, \
        "PP: MoE layers unsupported (aux loss + heterogeneous stages)"

    layer_module = TransformerEncoderLayer(
        num_heads=cfg.num_heads, d_model=cfg.d_model,
        d_ff=cfg.d_ff or 4 * cfg.d_model, dropout_rate=cfg.dropout,
        attention_dropout=cfg.attention_dropout, activation="gelu",
        pre_norm=cfg.pre_norm, bf16_softmax=cfg.bf16_softmax,
        dtype=model.dtype, param_dtype=model.param_dtype)

    def _stack(p):
        return stack_layer_params(
            p["encoder"]["encoder"]["transformer"], cfg.num_layers)

    def _masked_ctc(log_probs, frame_lengths, targets, target_lengths, rows):
        per_row = ctc_loss(log_probs, frame_lengths, targets, target_lengths,
                           blank=Offsets.GO, reduction="none")
        if loss_reduction == "sum":
            return jnp.sum(per_row * rows)
        per = per_row / jnp.maximum(target_lengths.astype(jnp.float32), 1.0)
        return jnp.sum(per * rows) / jnp.maximum(jnp.sum(rows), 1.0)

    def _forward(p, signal, signal_lengths, rng, train):
        rngs = None
        if train:
            rngs = {"dropout": jax.random.fold_in(rng, 0),
                    "mask": jax.random.fold_in(rng, 1)}
        h, attn_mask, pad_mask = model.apply(
            {"params": p}, signal, signal_lengths, train=train, rngs=rngs,
            method="pipeline_pre")
        b, t, c = h.shape
        if b % n_micro:
            raise ValueError(f"batch {b} not divisible by {n_micro} microbatches")
        if attn_mask is None:
            attn_mask = jnp.ones((b, 1, 1, t), bool)
        xs = h.reshape(n_micro, b // n_micro, t, c)
        masks = attn_mask.reshape(n_micro, b // n_micro, 1, 1, t)
        ys = pipeline_layers(layer_module, _stack(p), xs, masks, mesh,
                             train=train, rng=(None if rng is None else
                                               jax.random.fold_in(rng, 2)))
        encoded = ys.reshape(b, t, c)
        log_probs = model.apply({"params": p}, encoded, method="pipeline_head")
        return log_probs, pad_mask

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        targets, target_lengths = clean_targets(batch["token_ids"],
                                                batch["token_lengths"])
        rows = row_validity(batch)

        def loss_fn(p):
            log_probs, pad_mask = _forward(
                p, batch["signal"], batch["signal_lengths"], rng, True)
            frame_lengths = jnp.sum(pad_mask, axis=-1)
            return _masked_ctc(log_probs, frame_lengths, targets,
                               target_lengths, rows)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        bsz = jnp.sum(rows)
        new_state, gnorm = state.apply_gradients(
            grads, tx, grad_scale=1.0 / jnp.maximum(bsz, 1.0),
            clip_norm=clip)
        toks = jnp.sum(target_lengths * rows).astype(jnp.float32)
        return new_state, loss, bsz, toks

    @jax.jit
    def eval_fn(params, batch):
        targets, target_lengths = clean_targets(batch["token_ids"],
                                                batch["token_lengths"])
        log_probs, pad_mask = _forward(
            params, batch["signal"], batch["signal_lengths"], None, False)
        frame_lengths = jnp.sum(pad_mask, axis=-1)
        loss = _masked_ctc(log_probs, frame_lengths, targets, target_lengths,
                           row_validity(batch))
        frames = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
        return loss, frames, frame_lengths

    return train_step, eval_fn
