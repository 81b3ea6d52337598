"""CTC loss parity vs torch's native kernel, and mask/metric units."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from audio8_tpu.ops.ctc import ctc_loss, ctc_greedy_decode, greedy_collapse
from audio8_tpu.ops.masks import span_mask, compact_mask_indices, num_spans, sequence_mask
from audio8_tpu.ops.metrics import edit_distance, postproc_letters, postproc_bpe


def _rand_ctc_case(rng, b=4, t=50, v=12, u_max=15, blank=0):
    logits = rng.normal(size=(b, t, v)).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    input_lengths = rng.integers(t // 2, t + 1, size=b).astype(np.int32)
    target_lengths = rng.integers(1, u_max + 1, size=b).astype(np.int32)
    targets = rng.integers(1, v, size=(b, u_max)).astype(np.int32)  # labels != blank
    for i in range(b):
        targets[i, target_lengths[i]:] = 0
    return log_probs, input_lengths, targets, target_lengths


@pytest.mark.parametrize("reduction", ["sum", "mean", "none"])
def test_ctc_loss_matches_torch(rng, reduction):
    blank = 0
    log_probs, input_lengths, targets, target_lengths = _rand_ctc_case(rng)
    got = ctc_loss(
        jnp.asarray(log_probs), jnp.asarray(input_lengths),
        jnp.asarray(targets), jnp.asarray(target_lengths),
        blank=blank, reduction=reduction,
    )
    want = F.ctc_loss(
        torch.from_numpy(np.transpose(log_probs, (1, 0, 2))),
        torch.from_numpy(targets.astype(np.int64)),
        torch.from_numpy(input_lengths.astype(np.int64)),
        torch.from_numpy(target_lengths.astype(np.int64)),
        blank=blank, reduction=reduction if reduction != "none" else "none",
        zero_infinity=True,
    ).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_ctc_loss_repeated_labels(rng):
    """Repeated labels force the skip-transition legality check."""
    blank = 0
    b, t, v = 2, 30, 6
    logits = rng.normal(size=(b, t, v)).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    targets = np.array([[2, 2, 3, 3, 2], [1, 1, 1, 1, 1]], np.int32)
    target_lengths = np.array([5, 5], np.int32)
    input_lengths = np.array([t, t - 3], np.int32)
    got = ctc_loss(jnp.asarray(log_probs), jnp.asarray(input_lengths),
                   jnp.asarray(targets), jnp.asarray(target_lengths), blank=blank)
    want = F.ctc_loss(
        torch.from_numpy(np.transpose(log_probs, (1, 0, 2))),
        torch.from_numpy(targets.astype(np.int64)),
        torch.from_numpy(input_lengths.astype(np.int64)),
        torch.from_numpy(target_lengths.astype(np.int64)),
        blank=blank, reduction="sum", zero_infinity=True,
    ).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


def test_ctc_loss_impossible_is_zeroed(rng):
    """target longer than input frames -> inf -> zero_infinity clamps to 0."""
    b, t, v = 1, 4, 5
    log_probs = np.asarray(
        jax.nn.log_softmax(jnp.asarray(rng.normal(size=(b, t, v)).astype(np.float32)))
    )
    targets = np.array([[1, 2, 3, 4]], np.int32)
    got = ctc_loss(jnp.asarray(log_probs), jnp.asarray([t], np.int32),
                   jnp.asarray(targets), jnp.asarray([4], np.int32), blank=0)
    # S = 9 states cannot be traversed in 4 frames... actually 2U+1=9 needs
    # >= U=4 frames for labels alone; t=4 == U so it's feasible only with no
    # blanks and no repeats; targets distinct so loss finite. Make impossible:
    got2 = ctc_loss(jnp.asarray(log_probs[:, :3]), jnp.asarray([3], np.int32),
                    jnp.asarray(targets), jnp.asarray([4], np.int32), blank=0)
    assert np.isfinite(np.asarray(got))
    np.testing.assert_allclose(np.asarray(got2), 0.0)


def test_ctc_grad_matches_torch(rng):
    """Compare d loss / d logits end-to-end through log_softmax.

    (torch's fused CTC backward returns the gradient wrt the log_softmax
    *inputs*, so raw d/d log_probs is not comparable — the chained gradient
    wrt logits is.)"""
    blank = 0
    b, t, v, u_max = 2, 20, 8, 6
    logits = rng.normal(size=(b, t, v)).astype(np.float32)
    input_lengths = rng.integers(t // 2, t + 1, size=b).astype(np.int32)
    target_lengths = rng.integers(1, u_max + 1, size=b).astype(np.int32)
    targets = rng.integers(1, v, size=(b, u_max)).astype(np.int32)

    def f(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return ctc_loss(lp, jnp.asarray(input_lengths), jnp.asarray(targets),
                        jnp.asarray(target_lengths), blank=blank)

    got = np.asarray(jax.grad(f)(jnp.asarray(logits)))

    lg_t = torch.from_numpy(np.transpose(logits, (1, 0, 2)).copy()).requires_grad_(True)
    loss = F.ctc_loss(
        lg_t.log_softmax(-1), torch.from_numpy(targets.astype(np.int64)),
        torch.from_numpy(input_lengths.astype(np.int64)),
        torch.from_numpy(target_lengths.astype(np.int64)),
        blank=blank, reduction="sum", zero_infinity=True,
    )
    loss.backward()
    want = np.transpose(lg_t.grad.numpy(), (1, 0, 2))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_greedy_collapse():
    assert greedy_collapse([0, 1, 1, 0, 2, 2, 2, 0, 1], blank=0) == [1, 2, 1]
    assert greedy_collapse([0, 0, 0], blank=0) == []


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], [1, 2]) == 2
    assert edit_distance([1, 2, 3], [1, 2, 3]) == 0


def test_postproc():
    assert postproc_letters(list("AB|CD|")) == "AB CD"
    assert postproc_bpe(["HEL@@", "LO", "WOR@@", "LD"]) == "HELLO WORLD"


def test_sequence_mask():
    m = np.asarray(sequence_mask(jnp.asarray([2, 4]), 5))
    assert m.tolist() == [[True, True, False, False, False],
                          [True, True, True, True, False]]


def test_span_mask_properties():
    key = jax.random.PRNGKey(0)
    b, t, p, L = 8, 200, 0.65, 10
    m = np.asarray(span_mask(key, b, t, p=p, span_len=L))
    assert m.shape == (b, t)
    n = num_spans(t, p, L)
    counts = m.sum(-1)
    assert (counts >= L).all() and (counts <= n * L).all()
    # mask rate should be near p (minus overlap loss)
    assert 0.3 < counts.mean() / t < 0.7


def test_compact_mask_indices():
    mask = jnp.asarray([[False, True, True, False, True],
                        [True, False, False, False, False]])
    idx, valid = compact_mask_indices(mask, 4)
    assert np.asarray(idx)[0, :3].tolist() == [1, 2, 4]
    assert np.asarray(valid).sum(axis=1).tolist() == [3, 1]
    # gathered positions are masked ones, in order
    assert np.asarray(valid)[1, 0] and not np.asarray(valid)[1, 1]
