"""ARPA n-gram language model for beam-search fusion.

The reference fuses KenLM through ctcdecode (alpha/beta weights,
/root/reference/audio8/ctc.py:12-30). kenlm isn't available in this
environment, so this is a self-contained ARPA reader with standard
backoff scoring; ``PrefixBeamSearch`` uses it for word-level fusion at
'|' boundaries. Scores are natural-log (ARPA log10 converted), matching
ctcdecode's scale.
"""
from __future__ import annotations

import gzip
import math
from typing import Dict, Sequence, Tuple

LOG10 = math.log(10.0)

# Every KenLM binary (probing or trie, any version) starts with this
# sanity-header magic (kenlm lm/binary_format.cc kMagicBeforeVersion).
# The reference hands such files to ctcdecode's bundled kenlm
# (/root/reference/audio8/ctc.py:22-30); PROBING binaries load through
# ops/kenlm_bin.KenLMBinaryLM, this text reader handles ARPA only.
KENLM_BINARY_MAGIC = b"mmap lm http://kheafield.com/code format version"


def ensure_arpa(path: str) -> None:
    """Raise if ``path`` is a KenLM *binary* model rather than ARPA text
    (otherwise a binary file would garbled-parse as ARPA with no useful
    error). Callers that support binaries catch this and route to
    ``ops.kenlm_bin.KenLMBinaryLM`` (see ops/beam._load_lm)."""
    opener = gzip.open if path.endswith(".gz") else open
    try:
        with opener(path, "rb") as f:
            head = f.read(len(KENLM_BINARY_MAGIC))
    except OSError:
        return  # let the real reader produce its own error
    if head == KENLM_BINARY_MAGIC:
        raise ValueError(
            f"{path} is a KenLM binary model, not ARPA text. PROBING, "
            "TRIE and QUANT_TRIE binaries load via "
            "audio8_tpu.ops.kenlm_bin.KenLMBinaryLM / the native C++ "
            "reader (PrefixBeamSearch routes there automatically); "
            "REST_PROBING and -a array-trie binaries need the original "
            "ARPA (lmplz emits it; ARPA may be gzipped), a rebuild as a "
            "supported subtype, or in-package estimation: "
            "a8t-train-ngram --input corpus.txt --output lm.arpa "
            "--order <order>")


class ArpaLM:
    """Backoff n-gram LM loaded from an ARPA file (optionally gzipped)."""

    def __init__(self, path: str):
        ensure_arpa(path)
        self.ngrams: Dict[Tuple[str, ...], Tuple[float, float]] = {}
        self.order = 0
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8", errors="replace") as f:
            section = 0
            for line in f:
                line = line.strip()
                if not line or line.startswith("\\data\\"):
                    continue
                if line.startswith("\\") and "-grams:" in line:
                    section = int(line[1:line.index("-")])
                    self.order = max(self.order, section)
                    continue
                if line.startswith("\\end\\"):
                    break
                if section == 0:
                    continue
                parts = line.split("\t")
                if len(parts) < 2:
                    parts = line.split()
                    if len(parts) < section + 1:
                        continue
                    prob = float(parts[0])
                    words = tuple(parts[1:section + 1])
                    backoff = float(parts[section + 1]) if len(parts) > section + 1 else 0.0
                else:
                    prob = float(parts[0])
                    words = tuple(parts[1].split())
                    backoff = float(parts[2]) if len(parts) > 2 else 0.0
                self.ngrams[words] = (prob * LOG10, backoff * LOG10)

    def logp(self, word: str, context: Tuple[str, ...]) -> float:
        """ln P(word | context) with standard backoff; OOV falls back to
        <unk> or a -100 floor like kenlm.

        Backoff weights ACCUMULATE across every shortened context level
        (P(w|a,b) missing twice = bo(a,b) + bo(b) + P(w)), matching the
        C++ twin (csrc/arpa_lm.cc logp backoff_acc) and kenlm semantics.
        """
        context = tuple(context[-(self.order - 1):]) if self.order > 1 else ()
        backoff_acc = 0.0
        while True:
            entry = self.ngrams.get(context + (word,))
            if entry is not None:
                return backoff_acc + entry[0]
            if not context:
                unk = self.ngrams.get(("<unk>",))
                return backoff_acc + (unk[0] if unk is not None else -100.0 * LOG10)
            bo = self.ngrams.get(context)
            if bo is not None:
                backoff_acc += bo[1]
            context = context[1:]

    def score_sequence(self, words: Sequence[str]) -> float:
        total = 0.0
        ctx: Tuple[str, ...] = ()
        for w in words:
            total += self.logp(w, ctx)
            ctx = ctx + (w,)
        return total
