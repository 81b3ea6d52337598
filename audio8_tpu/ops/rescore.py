"""Neural-LM n-best rescoring of CTC beam output.

Beyond the reference (whose LM fusion is shallow, inside the beam,
ctc.py:22-30): take the beam's n-best label sequences, score each with

    score(h) = ctc_logp(h | frames) + alpha * lm_logp(h) + beta * |h|

where ``ctc_logp`` is the EXACT acoustic likelihood from the CTC
forward recursion (ops/ctc.py — the beam's internal scores are
approximations over surviving prefixes, so recomputing is both cleaner
and decoder-agnostic), and ``lm_logp`` comes from an ``a8t-train-lm``
checkpoint (models/text.CausalTextLM). Deep rescoring with a neural LM
typically beats shallow ARPA fusion at equal beam width.

TPU shape discipline: hypotheses pad to a small length grid and batch
into fixed shapes, so the scorer compiles a handful of programs no
matter the n-best contents.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from audio8_tpu.utils import Offsets

_LEN_GRID = [16, 32, 64, 128, 256, 512]


def _snap_len(n: int) -> int:
    for g in _LEN_GRID:
        if g >= n:
            return g
    return ((n + 127) // 128) * 128


class NeuralLMRescorer:
    """Self-configures from an ``a8t-train-lm`` basedir (lm_config.json +
    latest checkpoint); scores letter/BPE id sequences."""

    def __init__(self, lm_dir: str, alpha: float = 0.5,
                 word_bonus: float = 0.0, dtype=jnp.float32):
        from audio8_tpu.config import TextLMConfig
        from audio8_tpu.models.text import CausalTextLM
        from audio8_tpu.train.checkpoint import (find_latest_checkpoint,
                                                 load_checkpoint)

        with open(os.path.join(lm_dir, "lm_config.json")) as f:
            raw = json.load(f)
        raw.pop("dict_file", None)
        self.config = TextLMConfig(**raw)
        self.alpha = float(alpha)
        self.word_bonus = float(word_bonus)
        self.model = CausalTextLM(config=self.config, dtype=dtype)
        path, _ = find_latest_checkpoint(lm_dir)
        loaded = load_checkpoint(path)
        self.params = jax.tree_util.tree_map(
            np.asarray, loaded.get("params", loaded))

        def _logp(params, ids, lengths):
            return self.model.apply({"params": params}, ids, lengths,
                                    method=self.model.sequence_logp)

        self._logp = jax.jit(_logp)

    def lm_logp(self, hyps: Sequence[Sequence[int]]) -> np.ndarray:
        """Total LM log-prob of each id sequence (GO-context, EOS-closed)."""
        if not hyps:
            return np.zeros((0,), np.float32)
        rows = [[Offsets.GO] + list(h) + [Offsets.EOS] for h in hyps]
        L = _snap_len(max(len(r) for r in rows))
        ids = np.full((len(rows), L), Offsets.PAD, np.int32)
        lens = np.zeros((len(rows),), np.int32)
        for i, r in enumerate(rows):
            ids[i, :len(r)] = r
            lens[i] = len(r)
        return np.asarray(self._logp(self.params, jnp.asarray(ids),
                                     jnp.asarray(lens)), np.float32)


def ctc_label_logp(log_probs: np.ndarray, frame_length: int,
                   hyps: Sequence[Sequence[int]],
                   blank: Optional[int] = None) -> np.ndarray:
    """Exact CTC log-likelihood of each hypothesis for ONE utterance's
    ``(T', V)`` frame log-probs (forward recursion, ops/ctc.py)."""
    from audio8_tpu.ops.ctc import ctc_loss

    if not hyps:
        return np.zeros((0,), np.float32)
    blank = Offsets.GO if blank is None else blank
    U = _snap_len(max(max((len(h) for h in hyps), default=1), 1))
    tgt = np.zeros((len(hyps), U), np.int32)
    tlen = np.zeros((len(hyps),), np.int32)
    for i, h in enumerate(hyps):
        tgt[i, :len(h)] = list(h)
        tlen[i] = len(h)
    lp = jnp.asarray(np.repeat(log_probs[None, :, :], len(hyps), axis=0))
    nll = ctc_loss(lp, jnp.full((len(hyps),), int(frame_length), jnp.int32),
                   jnp.asarray(tgt), jnp.asarray(tlen), blank=blank,
                   reduction="none", impl="scan")
    return -np.asarray(nll, np.float32)


def rescore_transducer_nbest(acoustic_scores: Sequence[float],
                             nbest_ids: Sequence[Sequence[int]],
                             rescorer: NeuralLMRescorer) -> int:
    """Index of the best transducer hypothesis under acoustic + LM +
    length score. Unlike the CTC path there is no acoustic recompute:
    ``Transducer.decode_beam``'s scores are already the exact
    explored-alignment marginals log P(y | x)."""
    if not nbest_ids:
        return 0
    lm = rescorer.lm_logp(nbest_ids)
    total = (np.asarray(acoustic_scores, np.float32)
             + rescorer.alpha * lm
             + rescorer.word_bonus * np.asarray(
                 [len(h) for h in nbest_ids], np.float32))
    total = np.where([len(h) == 0 for h in nbest_ids], -np.inf, total)
    if not np.isfinite(total).any():
        return 0
    return int(np.argmax(total))


def rescore_nbest(log_probs: np.ndarray, frame_length: int,
                  nbest_ids: Sequence[Sequence[int]],
                  rescorer: NeuralLMRescorer,
                  blank: Optional[int] = None) -> int:
    """Index of the best hypothesis under acoustic + LM + length score.

    Empty hypotheses score -inf unless every hypothesis is empty."""
    if not nbest_ids:
        return 0
    ac = ctc_label_logp(log_probs, frame_length, nbest_ids, blank)
    lm = rescorer.lm_logp(nbest_ids)
    total = ac + rescorer.alpha * lm + rescorer.word_bonus * np.asarray(
        [len(h) for h in nbest_ids], np.float32)
    total = np.where([len(h) == 0 for h in nbest_ids], -np.inf, total)
    if not np.isfinite(total).any():
        return 0
    return int(np.argmax(total))
