"""CTC loss and decoding, TPU-native.

The reference calls torch's native CTC kernel with cuDNN disabled
(/root/reference/audio8/ctc.py:196-205, blank=Offsets.GO, reduction='sum',
zero_infinity=True). Here the forward algorithm is a log-semiring band
recursion implemented as a ``lax.scan`` over time with the whole (B, S)
state resident on-chip; XLA fuses the 3-term band update into a handful of
VPU ops. A Pallas kernel path is provided for the fused forward-backward
(see audio8_tpu/ops/pallas/ctc_kernel.py) and selected automatically when
profitable.

Conventions: ``log_probs`` is (B, T, V) *already log-softmaxed*; ``targets``
is (B, U) padded; lengths are true frame/label counts. All math in float32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _logaddexp3(a, b, c):
    # Double-where pattern keeps gradients NaN-free when all inputs are
    # NEG_INF (log of zero-sum otherwise poisons the backward pass).
    m = jnp.maximum(jnp.maximum(a, b), c)
    safe = m > NEG_INF / 2
    m_safe = jnp.where(safe, m, 0.0)
    s = jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    out = m_safe + jnp.log(jnp.where(s > 0, s, 1.0))
    return jnp.where(safe, out, NEG_INF)


def _extended_labels(targets: jnp.ndarray, blank: int) -> jnp.ndarray:
    """(B, U) -> (B, 2U+1) interleaved with blanks: [b, y1, b, y2, ..., b]."""
    b, u = targets.shape
    ext = jnp.full((b, 2 * u + 1), blank, targets.dtype)
    return ext.at[:, 1::2].set(targets)


def ctc_forward_alphas(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: jnp.ndarray,
    blank: int,
):
    """Run the alpha recursion; returns (alpha_final, ext_labels).

    alpha_final: (B, S) log-alpha at each row's final frame (frames past
    input_length leave the state untouched).
    """
    bsz, t_max, _ = log_probs.shape
    ext = _extended_labels(targets, blank)  # (B, S)
    s = ext.shape[1]

    # Transition legality: state s can come from s-2 iff label[s] != blank and
    # label[s] != label[s-2].
    ext_prev2 = jnp.concatenate([jnp.full((bsz, 2), -1, ext.dtype), ext[:, :-2]], axis=1)
    allow_skip = (ext != blank) & (ext != ext_prev2)  # (B, S)

    emit0 = jnp.take_along_axis(log_probs[:, 0].astype(jnp.float32), ext, axis=-1)
    alpha0 = jnp.full((bsz, s), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(emit0[:, 0])
    if s > 1:
        alpha0 = alpha0.at[:, 1].set(emit0[:, 1])

    def step(alpha, inputs):
        lp_t, t = inputs  # lp_t: (B, V)
        emit = jnp.take_along_axis(lp_t.astype(jnp.float32), ext, axis=-1)  # (B, S)
        a_prev1 = jnp.concatenate([jnp.full((bsz, 1), NEG_INF), alpha[:, :-1]], axis=1)
        a_prev2 = jnp.concatenate([jnp.full((bsz, 2), NEG_INF), alpha[:, :-2]], axis=1)
        a_prev2 = jnp.where(allow_skip, a_prev2, NEG_INF)
        new = _logaddexp3(alpha, a_prev1, a_prev2) + emit
        active = (t < input_lengths)[:, None]
        return jnp.where(active, new, alpha), None

    ts = jnp.arange(1, t_max)
    alpha_final, _ = jax.lax.scan(
        step, alpha0, (log_probs[:, 1:].transpose(1, 0, 2), ts)
    )
    return alpha_final, ext


@functools.partial(jax.jit, static_argnames=("blank", "reduction", "impl"))
def ctc_loss(
    log_probs: jnp.ndarray,
    input_lengths: jnp.ndarray,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank: int = 0,
    reduction: str = "sum",
    zero_infinity: bool = True,
    impl: str = "auto",
) -> jnp.ndarray:
    """Negative log-likelihood of the target labelling under CTC.

    Matches ``torch.nn.functional.ctc_loss`` semantics (sum/mean/none
    reductions, zero_infinity) as exercised by the reference's ``CTCLoss``.

    impl: 'scan' (lax.scan band recursion), 'pallas' (fused
    forward-backward TPU kernel with custom VJP), or 'auto' (pallas on TPU
    when the state fits comfortably in VMEM, else scan).
    """
    if impl == "auto":
        s_pad = ((2 * targets.shape[1] + 1) + 127) // 128 * 128
        b_pad = (log_probs.shape[0] + 7) // 8 * 8
        fits = 4 * b_pad * s_pad * 4 <= 4 * 1024 * 1024  # 4 (B,S) f32 tiles
        impl = "pallas" if (jax.default_backend() == "tpu" and fits) else "scan"
    if impl == "pallas":
        from audio8_tpu.ops.pallas.ctc_kernel import ctc_loss_pallas

        loss = ctc_loss_pallas(log_probs, input_lengths, targets,
                               target_lengths, blank)
    else:
        alpha, _ = ctc_forward_alphas(log_probs, targets, input_lengths, blank)
        s_last = 2 * target_lengths  # index of final blank state
        a_blank = jnp.take_along_axis(alpha, s_last[:, None], axis=1)[:, 0]
        a_label = jnp.take_along_axis(
            alpha, jnp.maximum(s_last - 1, 0)[:, None], axis=1
        )[:, 0]
        a_label = jnp.where(target_lengths > 0, a_label, NEG_INF)
        ll = jnp.logaddexp(a_blank, a_label)
        loss = -ll
        if zero_infinity:
            loss = jnp.where(loss >= -NEG_INF / 2, 0.0, loss)
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        # torch: per-sample loss / target_length, then batch mean
        per = loss / jnp.maximum(target_lengths.astype(jnp.float32), 1.0)
        return jnp.mean(per)
    return loss


def ctc_greedy_decode(log_probs: jnp.ndarray) -> jnp.ndarray:
    """Per-frame argmax (B, T); blank removal / dedup happens host-side in
    the metrics path, matching /root/reference/audio8/ctc.py:161-163."""
    return jnp.argmax(log_probs, axis=-1).astype(jnp.int32)


def greedy_collapse(frames, blank: int):
    """Host-side unique_consecutive + blank removal for one utterance."""
    out = []
    prev = None
    for tok in frames:
        tok = int(tok)
        if tok != prev:
            if tok != blank:
                out.append(tok)
            prev = tok
    return out
