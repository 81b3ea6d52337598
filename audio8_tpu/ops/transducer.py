"""RNN-T (transducer) loss, TPU-native.

A capability beyond the reference (audio8's sequence losses are CTC,
/root/reference/audio8/ctc.py:186-206, and teacher-forced XE): the
transducer objective (Graves 2012, arXiv:1211.3711) marginalizes over
all monotonic alignments of a label sequence to the frame sequence,
with a prediction network making the output distribution depend on
label history — the standard objective for streaming ASR.

TPU-native design: the (T, U) lattice recursion is two nested
dependencies — alpha(t, u) needs alpha(t-1, u) (blank move) and
alpha(t, u-1) (emit move *within* the same frame). We scan over frames
(``lax.scan``), and solve each frame's in-column dependency as a
log-semiring *linear recurrence* over the label axis:

    alpha_t[u] = b[u]  (+)  a[u] (*) alpha_t[u-1]

where ``b[u] = alpha_{t-1}[u] + blank(t-1, u)``, ``a[u] =
emit(t, u-1)``, (+) = logaddexp and (*) = +. A first-order linear
recurrence is associative under composition, so each frame column
resolves in O(log U) depth with ``lax.associative_scan`` — fully
vectorized over (batch, label) instead of the classic O(T+U)
anti-diagonal wavefront. Gradients flow through the scan by autodiff
(the saved state is one (B, U+1) row per frame).

Conventions match ops/ctc.py: ``log_probs`` is (B, T, U+1, V) *already
log-softmaxed over V*; lengths are true frame/label counts; all lattice
math in float32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _logaddexp(a, b):
    # gradient-safe even when both sides are NEG_INF
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    return mx + jnp.log1p(jnp.exp(jnp.maximum(mn - mx, NEG_INF)))


def _recurrence_combine(x, y):
    """Compose first-order log-linear recurrence elements.

    Element (a, b) represents ``alpha[u] = a (*) alpha[u-1] (+) b``;
    composing element x (earlier) with y (later) gives
    ``(a_x (*) a_y, a_y (*) b_x (+) b_y)``.
    """
    ax, bx = x
    ay, by = y
    return ax + ay, _logaddexp(ay + bx, by)


def transducer_alphas(log_probs: jnp.ndarray, frame_lengths: jnp.ndarray,
                      targets: jnp.ndarray, label_lengths: jnp.ndarray,
                      blank: int):
    """Run the alpha lattice; returns (alpha_final (B, U+1), blank_lp).

    ``alpha_final[b]`` is the alpha row at frame ``frame_lengths[b] - 1``
    (frames past a row's length leave its state untouched);
    ``blank_lp`` is (B, T, U+1) blank emission log-probs for the final
    gather.
    """
    bsz, t_max, u1, _ = log_probs.shape
    lp = log_probs.astype(jnp.float32)
    blank_lp = lp[..., blank]  # (B, T, U+1)
    # emit_lp[b, t, u] = log P(y_{u+1} | t, u), -inf past the row's labels
    emit_lp = jnp.take_along_axis(
        lp[:, :, : u1 - 1, :], targets[:, None, :, None], axis=-1
    )[..., 0]  # (B, T, U)
    u_idx = jnp.arange(u1 - 1)
    emit_lp = jnp.where(u_idx[None, None, :] < label_lengths[:, None, None],
                        emit_lp, NEG_INF)

    alpha0 = jnp.full((bsz, u1), NEG_INF).at[:, 0].set(0.0)

    def step(alpha, inp):
        blank_t, emit_t, t = inp  # (B, U+1), (B, U), scalar
        # b[u]: arrive from frame t-1 via blank; frame 0 arrives from the
        # lattice origin (alpha0 itself encodes it: only u=0 is live)
        b = jnp.where(t > 0, alpha + blank_t, alpha)
        # a[u]: arrive from (t, u-1) via emitting label u; u=0 has none
        a = jnp.concatenate(
            [jnp.full((bsz, 1), NEG_INF), emit_t], axis=1)
        _, new = jax.lax.associative_scan(_recurrence_combine, (a, b), axis=1)
        active = (t < frame_lengths)[:, None]
        return jnp.where(active, new, alpha), None

    # blank_t at step t must be blank(t-1, ·): shift by one frame
    blank_in = jnp.concatenate(
        [jnp.zeros((bsz, 1, u1), jnp.float32), blank_lp[:, :-1]], axis=1)
    alpha_final, _ = jax.lax.scan(
        step, alpha0,
        (blank_in.transpose(1, 0, 2), emit_lp.transpose(1, 0, 2),
         jnp.arange(t_max)))
    return alpha_final, blank_lp


@functools.partial(jax.jit, static_argnames=("blank", "reduction"))
def transducer_loss(log_probs: jnp.ndarray, frame_lengths: jnp.ndarray,
                    targets: jnp.ndarray, label_lengths: jnp.ndarray,
                    blank: int = 0, reduction: str = "mean") -> jnp.ndarray:
    """Negative log-likelihood of each row's label sequence.

    log_probs: (B, T, U+1, V) log-softmaxed joint outputs; targets:
    (B, U) int padded; reduction: 'none' | 'sum' | 'mean' (mean over
    rows, like torchaudio.functional.rnnt_loss).
    """
    frame_lengths = frame_lengths.astype(jnp.int32)
    label_lengths = label_lengths.astype(jnp.int32)
    alpha_final, blank_lp = transducer_alphas(
        log_probs, frame_lengths, targets, label_lengths, blank)
    bsz = log_probs.shape[0]
    rows = jnp.arange(bsz)
    # ll = alpha(T-1, U) + blank(T-1, U)
    a_end = alpha_final[rows, label_lengths]
    last_t = jnp.maximum(frame_lengths - 1, 0)
    b_end = blank_lp[rows, last_t, label_lengths]
    ll = a_end + b_end
    # zero_infinity semantics (parity with ops/ctc.py): degenerate rows
    # (frame_lengths == 0, or numerically dead lattices) contribute 0
    loss = jnp.where(ll > NEG_INF / 2, -ll, 0.0)
    loss = jnp.where(frame_lengths > 0, loss, 0.0)
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    return jnp.mean(loss)


def transducer_loss_from_logits(logits: jnp.ndarray, frame_lengths,
                                targets, label_lengths, blank: int = 0,
                                reduction: str = "mean") -> jnp.ndarray:
    """Convenience wrapper: raw joint logits (B, T, U+1, V) -> loss."""
    return transducer_loss(
        jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
        frame_lengths, targets, label_lengths, blank=blank,
        reduction=reduction)
