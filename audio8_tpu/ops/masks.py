"""On-device masking ops.

The reference computes SpecAugment-style span masks on the host with NumPy
every step (``create_mask``, /root/reference/audio8/wav2vec2.py:189-216) and
round-trips them to the device. Here the same sampling scheme runs on-device
with ``jax.random`` under jit — no host sync in the hot path.

Semantics relative to the reference:
- number of spans: the reference stochastically rounds
  ``p * T / L + U[0,1)``; under jit the count must be static, so we use the
  deterministic round-half-up ``int(p * T / L + 0.5)`` (same expectation).
- span starts are sampled without replacement from ``[0, T - L]`` per row,
  exactly like ``np.random.choice(sz - min_len, num_mask, replace=False)``.
- the reference trims every row to the minimum masked count so that gathers
  are rectangular; we instead keep the true per-row counts and weight the
  loss by a validity mask (see :func:`compact_mask_indices`), which is both
  shape-static and unbiased.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) boolean mask, True = valid position.

    Equivalent of eight_mile ``sequence_mask`` used at
    /root/reference/audio8/train.py:33.
    """
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def num_spans(seq_len: int, p: float, span_len: int) -> int:
    """Static span count: round-half-up of p*T/L (reference adds U[0,1) to
    achieve the same expectation stochastically)."""
    return int(p * seq_len / float(span_len) + 0.5)


def span_mask(
    key: jax.Array,
    batch: int,
    seq_len: int,
    p: float = 0.65,
    span_len: int = 10,
) -> jnp.ndarray:
    """Sample a (B, T) boolean span mask on-device.

    For each row, ``N = num_spans(T, p, L)`` starts are drawn without
    replacement from ``[0, T - L]``; each start masks L consecutive frames.
    Overlapping spans merge, so per-row true counts vary in ``[N, N*L]``...
    well, in ``[L, N*L]``.
    """
    n = num_spans(seq_len, p, span_len)
    if n == 0:
        return jnp.zeros((batch, seq_len), jnp.bool_)
    max_start = max(seq_len - span_len, 1)

    # sampling-without-replacement via argsort of iid keys; keys come from
    # the fused integer hash (threefry permutation was measurable in the
    # train step — see docs/PERF.md)
    from audio8_tpu.ops.hashrand import hash_uniform, seed_from_key

    keys = hash_uniform((batch, max_start), seed_from_key(key))
    starts = jnp.argsort(keys, axis=-1)[:, :n]  # (B, n) distinct starts
    t = jnp.arange(seq_len)[None, None, :]
    covered = (t >= starts[..., None]) & (t < starts[..., None] + span_len)
    return jnp.any(covered, axis=1)


def compact_mask_indices(mask: jnp.ndarray, capacity: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compact a boolean (B, T) mask to static-width gather indices.

    Returns ``(indices, valid)`` where ``indices`` is (B, capacity) int32 —
    the first ``capacity`` masked positions per row in increasing order
    (stable) — and ``valid`` is (B, capacity) boolean marking real entries.
    Replaces the reference's dynamic boolean-mask gather
    (/root/reference/audio8/wav2vec2.py:946) with a fixed-shape gather that
    XLA can tile.
    """
    b, t = mask.shape
    capacity = min(capacity, t)
    # argsort of (not mask) is stable: masked indices first, ascending.
    order = jnp.argsort(~mask, axis=-1, stable=True)
    indices = order[:, :capacity].astype(jnp.int32)
    counts = jnp.sum(mask, axis=-1, keepdims=True)
    valid = jnp.arange(capacity)[None, :] < counts
    return indices, valid
