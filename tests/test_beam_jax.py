"""On-device CTC prefix beam search (ops/beam_jax.py) differential tests:
the jittable hash-merge formulation must produce the same ranked prefixes
as the host Python reference implementation (ops/beam.py, itself
differentially tested against the C++ trie)."""
import numpy as np
import jax

from audio8_tpu.ops.beam import _prefix_beam_search_py
from audio8_tpu.ops.beam_jax import ctc_beam_search_jax


def _random_log_probs(rng, b, t, v):
    x = rng.normal(size=(b, t, v)).astype(np.float32) * 2.0
    x = x - np.log(np.exp(x).sum(-1, keepdims=True))
    return x


def test_jax_beam_matches_python_reference():
    rng = np.random.default_rng(0)
    b, t, v, beam = 4, 40, 8, 6
    lp = _random_log_probs(rng, b, t, v)
    got, scores = ctc_beam_search_jax(lp, beam=beam, blank=0)
    for row in range(b):
        want = _prefix_beam_search_py(lp[row], blank=0, beam=beam,
                                      space_idx=None, alpha=0.0, beta=0.0)
        assert got[row][0] == want[0], (row, got[row][0], want[0])
        # ranked n-best agrees on the top 3
        assert got[row][:3] == want[:3], (row, got[row][:3], want[:3])
        assert np.all(np.diff(scores[row]) <= 1e-5)  # descending


def test_jax_beam_matches_python_with_word_bonus():
    """beta word-insertion bonus + space symbol: scoring (and therefore
    pruning and ranking) must match the host implementation."""
    rng = np.random.default_rng(1)
    b, t, v, beam = 3, 30, 8, 6
    lp = _random_log_probs(rng, b, t, v)
    space = 2
    got, _ = ctc_beam_search_jax(lp, beam=beam, blank=0, space=space,
                                 beta=1.5)
    for row in range(b):
        want = _prefix_beam_search_py(lp[row], blank=0, beam=beam,
                                      space_idx=space, alpha=0.0, beta=1.5)
        assert got[row][0] == want[0], (row, got[row][0], want[0])
        assert got[row][:3] == want[:3]


def test_jax_beam_frame_lengths_match_truncated_decode():
    rng = np.random.default_rng(2)
    b, t, v, beam = 3, 32, 6, 4
    lp = _random_log_probs(rng, b, t, v)
    lengths = np.array([32, 20, 9], np.int32)
    got, _ = ctc_beam_search_jax(lp, lengths, beam=beam, blank=0)
    for row in range(b):
        solo, _ = ctc_beam_search_jax(lp[row:row + 1, :lengths[row]],
                                      beam=beam, blank=0)
        assert got[row] == solo[0], row


def test_prefix_beam_search_device_backend_matches_host():
    """PrefixBeamSearch(device=True) must return the same transcriptions
    as the host backend (C++ trie or Python) for the no-LM case."""
    from audio8_tpu.ops.beam import PrefixBeamSearch

    vocab = ["<s>", "<pad>", "</s>", "<unk>", "|", "a", "b", "c"]
    rng = np.random.default_rng(4)
    lp = _random_log_probs(rng, 3, 30, len(vocab))
    lengths = np.array([30, 22, 15], np.int32)
    host = PrefixBeamSearch(vocab, alpha=0.0, beta=1.0, beam=8)
    dev = PrefixBeamSearch(vocab, alpha=0.0, beta=1.0, beam=8, device=True)
    assert dev.device
    for n_best in (1, 3):
        got = dev.run(lp, lengths, n_best=n_best)
        want = host.run(lp, lengths, n_best=n_best)
        assert got == want


def test_jax_beam_batch_rows_independent():
    rng = np.random.default_rng(3)
    lp = _random_log_probs(rng, 5, 25, 7)
    together, _ = ctc_beam_search_jax(lp, beam=4, blank=0)
    for row in range(5):
        alone, _ = ctc_beam_search_jax(lp[row:row + 1], beam=4, blank=0)
        assert together[row] == alone[0]
