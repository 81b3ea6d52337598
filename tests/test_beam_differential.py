"""Differential test: Python prefix beam search vs the native C++ kernel.

Both implement the same algorithm (Hannun-style prefix search, word
insertion bonus, n-gram LM fusion at word boundaries); on random inputs
their ranked n-best outputs must agree, with and without an LM.
"""
import numpy as np
import pytest

from audio8_tpu.ops.beam import PrefixBeamSearch
from audio8_tpu.utils import Offsets

ARPA = """\\data\\
ngram 1=5
ngram 2=2

\\1-grams:
-0.30103\tCAT\t-0.30103
-0.69897\tDOG\t-0.30103
-1.00000\tSAT\t-0.30103
-1.30103\t<unk>
-0.47712\tTHE\t-0.17609

\\2-grams:
-0.17609\tTHE CAT
-0.60206\tCAT SAT

\\end\\
"""


def _vocab():
    letters = ["A", "C", "D", "E", "G", "H", "O", "S", "T", "|"]
    return list(Offsets.VALUES) + letters


def _random_logprobs(rng, t, v):
    x = rng.normal(size=(t, v)).astype(np.float32) * 2.0
    x = x - np.log(np.exp(x).sum(-1, keepdims=True))
    return x


def _force_python(pbs: PrefixBeamSearch) -> PrefixBeamSearch:
    pbs._native = None
    if pbs.lm is not None:
        from audio8_tpu.ops.lm import ArpaLM

        pbs.lm = ArpaLM(pbs._lm_file)
    return pbs


@pytest.fixture
def lm_file(tmp_path):
    f = tmp_path / "lm.arpa"
    f.write_text(ARPA)
    return str(f)


@pytest.mark.parametrize("remap", [False, True])
@pytest.mark.parametrize("with_lm", [False, True])
def test_python_and_cpp_agree(rng, lm_file, with_lm, remap):
    if remap:
        # the production CTC id layout (blank = <s> = 0): caught the C++
        # no-LM path counting leading/repeated spaces as words
        # (beam.cc's old `sym == space_idx` bonus)
        Offsets.remap_fairseq_ctc()
    vocab = _vocab()
    kw = dict(alpha=0.7, beta=1.5, beam=8)
    if with_lm:
        kw["lm_file"] = lm_file
    native = PrefixBeamSearch(vocab, **kw)
    if native._native is None:
        pytest.skip("native beam kernel unavailable")
    python = _force_python(PrefixBeamSearch(vocab, **kw))

    lp = _random_logprobs(rng, 200, len(vocab))
    lengths = np.asarray([200])
    got_n = native.run(lp[None], lengths, n_best=4, return_ids=True)[0]
    got_p = python.run(lp[None], lengths, n_best=4, return_ids=True)[0]
    assert got_n[0] == got_p[0], "1-best differs between C++ and Python"
    assert got_n == got_p, "ranked n-best differs between C++ and Python"


def test_python_and_cpp_agree_peaked(rng, lm_file):
    """Peaked distributions (realistic post-training logits) with repeats
    and blanks — exercises the merged-prefix bookkeeping."""
    vocab = _vocab()
    seq = [Offsets.GO, 5, 5, Offsets.GO, 4, 4, 13, Offsets.GO, 8, 12, 13]
    t, v = len(seq) * 3, len(vocab)
    lp = np.full((t, v), -6.0, np.float32)
    for i in range(t):
        lp[i, seq[(i // 3) % len(seq)]] = -0.1
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    lp += rng.normal(size=lp.shape).astype(np.float32) * 0.3

    native = PrefixBeamSearch(vocab, alpha=0.7, beta=1.5, beam=12,
                              lm_file=lm_file)
    if native._native is None:
        pytest.skip("native beam kernel unavailable")
    python = _force_python(
        PrefixBeamSearch(vocab, alpha=0.7, beta=1.5, beam=12,
                         lm_file=lm_file))
    got_n = native.run(lp[None], None, n_best=3, return_ids=True)[0]
    got_p = python.run(lp[None], None, n_best=3, return_ids=True)[0]
    assert got_n == got_p
