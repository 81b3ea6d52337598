"""CTC prefix beam search with optional language-model fusion.

Replaces the reference's ctcdecode C++ binding
(/root/reference/audio8/ctc.py:11-60): same construction surface
(vocab_list, alpha, beta, beam, lm_file; blank = Offsets.GO; '|' <-> ' '
remap) and the same ``run`` n-best return convention. The hot loop prefers
the native C++ kernel (audio8_tpu/csrc) and falls back to a pure-Python
implementation of the same algorithm (Hannun et al. 2014 prefix search
with word-insertion bonus and n-gram LM fusion at word boundaries).
"""
from __future__ import annotations

import math
from collections import defaultdict
from typing import List, Optional, Sequence

import numpy as np

from audio8_tpu.utils import Offsets

LOG0 = -1e30


def _logaddexp(a: float, b: float) -> float:
    if a < b:
        a, b = b, a
    if b <= LOG0 / 2:
        return a
    return a + math.log1p(math.exp(b - a))


def _n_words(prefix, space_idx) -> int:
    """Completed (non-empty) words: spaces that terminate a word. Leading
    or repeated spaces earn no insertion bonus (ctcdecode semantics; keeps
    parity with csrc/arpa_lm.cc's n_words)."""
    if space_idx is None:
        return 0
    n = 0
    prev = space_idx
    for s in prefix:
        if s == space_idx and prev != space_idx:
            n += 1
        prev = s
    return n


def _kenlm_lm(lm_file: str):  # pragma: no cover - kenlm absent here
    """Optional kenlm-backed LM (reads ARPA *and* KenLM binary). Context
    is scored by string-prefix subtraction, matching ArpaLM.logp."""
    import kenlm  # type: ignore

    model = kenlm.Model(lm_file)

    class _KenLM:
        def logp(self, word, context):
            ctx = " ".join(context)
            full = (ctx + " " + word).strip()
            base = model.score(ctx, bos=False, eos=False) if ctx else 0.0
            return (model.score(full, bos=False, eos=False) - base) * \
                math.log(10)

    return _KenLM()


def _load_lm(lm_file: str):
    """Route by format: ARPA text (optionally gzipped) always loads
    through our own readers — native C++ first, pure-Python fallback —
    even when kenlm is installed (kenlm's stricter parser rejects files
    ours accept, e.g. gzipped ARPA). KenLM *binary* models (PROBING,
    TRIE and QUANT_TRIE) load through our own mmap'd C++ reader first
    (csrc/kenlm_bin.cc — the fast path, and the one the native
    LM-fused beam search consumes in-process), then kenlm itself when
    installed (bit-exact), then the pure-Python readers
    (ops/kenlm_bin.py); unsupported binary subtypes (REST_PROBING and
    the -a array-trie variants) fail with the ARPA-conversion recipe
    instead of garbled-parsing as ARPA text — the reference consumes
    all subtypes via ctcdecode's bundled kenlm
    (/root/reference/audio8/ctc.py:22-30)."""
    from audio8_tpu.ops.lm import ensure_arpa

    try:
        ensure_arpa(lm_file)
    except ValueError:
        try:
            from audio8_tpu.csrc import native

            return native.NativeKenLM(lm_file)
        except Exception:
            pass
        try:
            return _kenlm_lm(lm_file)
        except ImportError:
            from audio8_tpu.ops.kenlm_bin import KenLMBinaryLM

            return KenLMBinaryLM(lm_file)
    try:
        from audio8_tpu.csrc import native

        return native.NativeArpaLM(lm_file)
    except Exception:
        from audio8_tpu.ops.lm import ArpaLM

        return ArpaLM(lm_file)


def _prefix_beam_search_py(
    log_probs: np.ndarray,
    blank: int,
    beam: int,
    space_idx: Optional[int],
    alpha: float,
    beta: float,
    lm=None,
    id2sym=None,
) -> List[List[int]]:
    """Decode one utterance; returns the n-best list of id sequences.

    log_probs: (T, V) float. When an LM is given, completed words (at
    ``space_idx`` boundaries) are scored with weight ``alpha`` and each
    word adds insertion bonus ``beta`` — ctcdecode's fusion scheme.
    """
    T, V = log_probs.shape
    # beams: prefix tuple -> [p_blank, p_non_blank, lm_score]
    beams = {(): [0.0, LOG0, 0.0]}
    k = min(V, max(beam, 16))

    def set_lm(entry, value):
        # a prefix reached from several parents in one timestep must carry
        # ONE lm score; the writers agree by construction (same prefix =>
        # same completed words), so keep the first and take max on repeats
        # instead of blindly overwriting
        entry[2] = value if entry[2] is None else max(entry[2], value)

    def word_ending_at(prefix) -> str:
        chars = []
        for s_id in reversed(prefix):
            if s_id == space_idx:
                break
            chars.append(id2sym[s_id] if id2sym else str(s_id))
        return "".join(reversed(chars))

    def context_words(prefix) -> tuple:
        if id2sym is None:
            return ()
        text = "".join(id2sym[i] for i in prefix)
        return tuple(w for w in text.split(" ") if w)

    for t in range(T):
        lp = log_probs[t]
        cand_syms = np.argpartition(-lp, k - 1)[:k]
        next_beams: dict = defaultdict(lambda: [LOG0, LOG0, None])
        for prefix, (p_b, p_nb, lm_sc) in beams.items():
            p_tot = _logaddexp(p_b, p_nb)
            nb = next_beams[prefix]
            nb[0] = _logaddexp(nb[0], p_tot + lp[blank])
            set_lm(nb, lm_sc)
            last = prefix[-1] if prefix else None
            for c in cand_syms:
                c = int(c)
                if c == blank:
                    continue
                p_sym = lp[c]
                if c == last:
                    nb_rep = next_beams[prefix]
                    nb_rep[1] = _logaddexp(nb_rep[1], p_nb + p_sym)
                    new_prefix = prefix + (c,)
                    nb_new = next_beams[new_prefix]
                    nb_new[1] = _logaddexp(nb_new[1], p_b + p_sym)
                    set_lm(nb_new, lm_sc)
                else:
                    new_prefix = prefix + (c,)
                    nb_new = next_beams[new_prefix]
                    new_lm = lm_sc
                    if (lm is not None and space_idx is not None
                            and c == space_idx and prefix
                            and prefix[-1] != space_idx):
                        word = word_ending_at(prefix)
                        if word:
                            ctx = context_words(prefix[: len(prefix) - len(word)])
                            new_lm = lm_sc + lm.logp(word, ctx)
                    nb_new[1] = _logaddexp(nb_new[1], p_tot + p_sym)
                    set_lm(nb_new, new_lm)
        scored = []
        for prefix, entry in next_beams.items():
            p_b, p_nb, lm_sc = entry
            if lm_sc is None:
                lm_sc = entry[2] = 0.0
            score = (_logaddexp(p_b, p_nb) + alpha * lm_sc
                     + beta * _n_words(prefix, space_idx))
            scored.append((score, prefix, [p_b, p_nb, lm_sc]))
        scored.sort(key=lambda x: -x[0])
        beams = {prefix: vals for _, prefix, vals in scored[:beam]}
    ranked = sorted(
        beams.items(),
        key=lambda kv: -(
            _logaddexp(kv[1][0], kv[1][1]) + alpha * kv[1][2]
            + beta * _n_words(kv[0], space_idx)
        ),
    )
    return [list(prefix) for prefix, _ in ranked]


class PrefixBeamSearch:
    """Interface-compatible with the reference's wrapper (ctc.py:11-60)."""

    def __init__(self, vocab_list: Sequence[str], alpha: float = 0.2,
                 beta: float = 5.0, beam: int = 100,
                 lm_file: Optional[str] = None, device: bool = False):
        """``device=True`` (no-LM only): decode the whole batch with the
        on-device jittable search (ops/beam_jax.py) instead of per-row
        host decoding — one XLA program, no host round-trip per
        utterance. LM fusion always uses the host paths."""
        self.vocab_list = list(vocab_list)
        self.use_bar = "|" in self.vocab_list
        self.bar_off = self.vocab_list.index("|") if self.use_bar else -1
        if self.use_bar:
            self.vocab_list[self.bar_off] = " "
        self.beam = beam
        self.alpha = alpha
        self.beta = beta
        self.blank = Offsets.GO
        self._lm_file = lm_file
        self.lm = _load_lm(lm_file) if lm_file else None
        self.device = device and self.lm is None
        self._native = None
        try:
            from audio8_tpu.csrc import native  # type: ignore

            if hasattr(native, "prefix_beam_search"):
                self._native = native
        except Exception:
            pass

    def _decode_one(self, lp: np.ndarray) -> List[List[int]]:
        if self._native is not None:
            lp32 = np.ascontiguousarray(lp, np.float32)
            if self.lm is None:
                return self._native.prefix_beam_search(
                    lp32, self.blank, self.beam,
                    self.bar_off if self.use_bar else -1,
                    self.alpha, self.beta)
            if isinstance(self.lm, self._native.NativeLM):
                return self._native.prefix_beam_search_lm(
                    lp32, self.blank, self.beam,
                    self.bar_off if self.use_bar else -1,
                    self.alpha, self.beta, self.vocab_list, self.lm)
        return _prefix_beam_search_py(
            lp, self.blank, self.beam,
            self.bar_off if self.use_bar else None,
            self.alpha, self.beta, self.lm, self.vocab_list)

    def run(self, log_probs: np.ndarray, frame_lengths=None, n_best=None,
            return_ids: bool = False):
        """n-best transcriptions per batch row; 1-best collapses the
        singleton dim like the reference (ctc.py:32-60)."""
        log_probs = np.asarray(log_probs)
        B = log_probs.shape[0]
        if n_best is None:
            n_best = self.beam

        def transform(t):
            return t if return_ids else (
                self.vocab_list[t] if t != self.bar_off else "|")

        if self.device:
            from audio8_tpu.ops.beam_jax import ctc_beam_search_jax

            nbest_rows, _ = ctc_beam_search_jax(
                log_probs, frame_lengths, beam=self.beam,
                blank=self.blank, space=self.bar_off, beta=self.beta)
            out = []
            for row in nbest_rows:
                nbest = row[:n_best]
                if n_best == 1:
                    seq = nbest[0] if nbest else []
                    out.append([transform(t) for t in seq])
                else:
                    out.append([[transform(t) for t in seq] for seq in nbest])
            return out

        out = []
        for b in range(B):
            lp = log_probs[b]
            if frame_lengths is not None:
                lp = lp[: int(frame_lengths[b])]
            nbest = self._decode_one(lp)[:n_best]
            if n_best == 1:
                seq = nbest[0] if nbest else []
                out.append([transform(t) for t in seq])
            else:
                out.append([[transform(t) for t in seq] for seq in nbest])
        return out
