"""WER/CER metrics (host-side, eval only).

Mirrors the reference's metric accumulation (/root/reference/audio8/ctc.py:
139-183): greedy decode -> unique_consecutive -> drop blank, edit distance
for character and word errors. The reference leans on the C++ `editdistance`
package; we ship our own C++ kernel (audio8_tpu/csrc/editdistance.cc) with a
pure-Python fallback — both the banded O(nm) Levenshtein.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Sequence

import numpy as np

from audio8_tpu.ops.ctc import greedy_collapse
from audio8_tpu.utils import Offsets

try:  # C++ fast path (built by audio8_tpu/csrc/build.py)
    from audio8_tpu.csrc import native  # type: ignore

    def edit_distance(a: Sequence, b: Sequence) -> int:
        return native.edit_distance(list(a), list(b))

except Exception:  # pragma: no cover - exercised when the ext isn't built

    def edit_distance(a: Sequence, b: Sequence) -> int:
        """Levenshtein distance with two-row DP."""
        if len(a) < len(b):
            a, b = b, a
        if not b:
            return len(a)
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i] + [0] * len(b)
            for j, cb in enumerate(b, 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            prev = cur
        return prev[-1]


def postproc_letters(sentence: Iterable[str]) -> str:
    """Letter targets: join, drop spaces, '|' -> word boundary
    (/root/reference/audio8/ctc.py:63-66)."""
    s = "".join(sentence)
    return s.replace(" ", "").replace("|", " ").strip()


def postproc_bpe(sentence: Iterable[str]) -> str:
    """BPE targets: join with spaces, strip '@@ ' continuations
    (/root/reference/audio8/ctc.py:69-72)."""
    s = " ".join(sentence)
    return s.replace("@@ ", "").strip()


def _target_units(target_row: np.ndarray) -> List[int]:
    keep = (target_row != Offsets.PAD) & (target_row != Offsets.EOS)
    return [int(x) for x in target_row[keep]]


def ctc_metrics(
    log_probs: np.ndarray,
    targets: np.ndarray,
    input_lengths: np.ndarray,
    index2vocab: Dict[int, str],
    postproc_fn: Callable = postproc_letters,
) -> Dict[str, int]:
    """Greedy-decode WER/CER numerators/denominators for one batch.

    log_probs: (B, T, V) — or pre-argmaxed (B, T) int frames.
    input_lengths: *output-frame* lengths (the reference passes raw sample
    lengths here and slices frames with them, which is a no-op upper bound;
    we pass true frame counts).
    """
    if log_probs.ndim == 3:
        frames = np.argmax(log_probs, axis=-1)
    else:
        frames = log_probs
    blank = Offsets.GO
    m = dict(c_errors=0, c_total=0, w_errors=0, wv_errors=0, w_total=0)
    for fr, t_row, inp_l in zip(frames, targets, input_lengths):
        pred_units_arr = greedy_collapse(fr[: int(inp_l)], blank)
        targ_units_arr = _target_units(np.asarray(t_row))
        m["c_errors"] += edit_distance(pred_units_arr, targ_units_arr)
        m["c_total"] += len(targ_units_arr)
        targ_words = postproc_fn([index2vocab[x] for x in targ_units_arr]).split()
        pred_words = postproc_fn([index2vocab[x] for x in pred_units_arr]).split()
        dist = edit_distance(pred_words, targ_words)
        m["w_errors"] += dist
        m["wv_errors"] += dist
        m["w_total"] += len(targ_words)
    return m


def decode_metrics(
    decoded: Sequence[Sequence[int]],
    targets: np.ndarray,
    index2vocab: Dict[int, str],
    postproc_fn: Callable = postproc_letters,
) -> Dict[str, int]:
    """Metrics for already-decoded id sequences (seq2seq / beam outputs),
    mirroring /root/reference/audio8/ctc.py:92-136. The decoded rows are
    deduped consecutively and blank-stripped like the CTC path."""
    blank = Offsets.GO
    m = dict(c_errors=0, c_total=0, w_errors=0, wv_errors=0, w_total=0)
    for dp, t_row in zip(decoded, targets):
        pred_units_arr = greedy_collapse(dp, blank)
        targ_units_arr = _target_units(np.asarray(t_row))
        m["c_errors"] += edit_distance(pred_units_arr, targ_units_arr)
        m["c_total"] += len(targ_units_arr)
        targ_words = postproc_fn([index2vocab[x] for x in targ_units_arr]).split()
        pred_words = postproc_fn([index2vocab[x] for x in pred_units_arr]).split()
        dist = edit_distance(pred_words, targ_words)
        m["w_errors"] += dist
        m["wv_errors"] += dist
        m["w_total"] += len(targ_words)
    return m


def decode_text_wer(
    pred_units: str,
    target_row: np.ndarray,
    index2vocab: Dict[int, str],
    postproc_fn: Callable = postproc_letters,
):
    """Word errors for a single decoded transcription string vs a target row
    (/root/reference/audio8/ctc.py:75-89)."""
    targ_units = [index2vocab[x] for x in _target_units(np.asarray(target_row))]
    targ_words = postproc_fn(targ_units).split()
    pred_words = postproc_fn(pred_units).split()
    return edit_distance(pred_words, targ_words), len(targ_words)
