"""Interpolated modified Kneser-Ney estimation (ops/ngram.py).

The central guard is the normalization property: for EVERY context the
model stores, the backoff-scored distribution over the full vocabulary
(including <unk>) must sum to 1 — the defining invariant of a
well-formed ARPA prob/backoff pair. It is checked through the
independent ArpaLM reader (and the C++ reader), so a wrong discount,
denominator, backoff weight, or ARPA serialization all break it.
"""
import math

import numpy as np
import pytest

from audio8_tpu.ops.lm import ArpaLM
from audio8_tpu.ops.ngram import (BOS, EOS, UNK, adjusted_counts,
                                  count_ngrams, train_kneser_ney)

LOG10 = math.log(10.0)


def _corpus(seed=0, n_sent=60, vocab=("A", "B", "C", "D", "E")):
    rng = np.random.default_rng(seed)
    sents = []
    for _ in range(n_sent):
        n = int(rng.integers(1, 9))
        # skewed, Markov-ish text so contexts repeat
        sent, prev = [], 0
        for _ in range(n):
            prev = int((prev + rng.integers(0, 3)) % len(vocab))
            sent.append(vocab[prev])
        sents.append(sent)
    return sents


def _train_to_arpa(tmp_path, sents, order):
    lm = train_kneser_ney(sents, order)
    path = str(tmp_path / f"kn{order}.arpa")
    lm.write_arpa(path)
    return lm, path


def _assert_normalized(lm, reader, vocab):
    """sum_w P(w | ctx) == 1 for every stored context."""
    contexts = {()} | {g[:-1] for g in lm.prob if len(g) > 1}
    for ctx in sorted(contexts):
        if ctx and ctx[-1] == EOS:
            continue  # </s> never has successors
        total = sum(math.exp(reader.logp(w, ctx)) for w in vocab)
        assert abs(total - 1.0) < 1e-6, (ctx, total)


@pytest.mark.parametrize("order", [1, 2, 3, 4])
def test_backoff_distribution_sums_to_one(tmp_path, order):
    sents = _corpus()
    lm, path = _train_to_arpa(tmp_path, sents, order)
    reader = ArpaLM(path)
    vocab = sorted({w for s in sents for w in s} | {EOS, UNK})
    _assert_normalized(lm, reader, vocab)


def test_native_reader_agrees_and_normalizes(tmp_path):
    native = pytest.importorskip("audio8_tpu.csrc.native")
    sents = _corpus(seed=1)
    lm, path = _train_to_arpa(tmp_path, sents, 3)
    py = ArpaLM(path)
    cc = native.NativeArpaLM(path)
    vocab = sorted({w for s in sents for w in s} | {EOS, UNK})
    _assert_normalized(lm, cc, vocab)
    rng = np.random.default_rng(2)
    words = vocab + ["ZZZ"]  # incl. an OOV
    for _ in range(50):
        w = words[int(rng.integers(0, len(words)))]
        ctx = tuple(words[int(rng.integers(0, len(words)))]
                    for _ in range(int(rng.integers(0, 3))))
        np.testing.assert_allclose(cc.logp(w, ctx), py.logp(w, ctx),
                                   rtol=1e-5, atol=1e-5)


def test_learns_the_corpus_statistics(tmp_path):
    """A trigram KN model must (a) beat the unigram model on held-in
    text and (b) prefer an observed continuation over an unobserved one."""
    sents = [list("ABCAB"), list("ABCAB"), list("ABCDE"), list("BCABC")] * 5
    lm3, p3 = _train_to_arpa(tmp_path, sents, 3)
    lm1, p1 = _train_to_arpa(tmp_path, sents, 1)
    r3, r1 = ArpaLM(p3), ArpaLM(p1)

    def nll(reader):
        total, n = 0.0, 0
        for s in sents:
            ctx = (BOS,)
            for w in s + [EOS]:
                total -= reader.logp(w, ctx)
                ctx = ctx + (w,)
                n += 1
        return total / n

    assert nll(r3) < nll(r1) - 0.2
    # C always follows A B in the corpus
    assert r3.logp("C", ("A", "B")) > r3.logp("E", ("A", "B")) + 1.0


def test_counts_and_adjusted_counts():
    sents = [["A", "B"], ["A", "B"], ["C", "B"]]
    raw = count_ngrams(sents, 2)
    assert raw[0][("A",)] == 2 and raw[0][("B",)] == 3
    assert (BOS,) not in raw[0]  # <s> is context-only
    assert raw[1][(BOS, "A")] == 2 and raw[1][("B", EOS)] == 3
    adj = adjusted_counts(raw)
    # bigrams (highest order) keep raw counts
    assert adj[1] == raw[1]
    # continuation: B is preceded by {A, C} -> 2, not its raw 3
    assert adj[0][("B",)] == 2
    assert adj[0][("A",)] == 1  # only <s> precedes A


def test_cli_end_to_end_with_beam_fusion(tmp_path):
    """a8t-train-ngram -> ARPA -> PrefixBeamSearch fusion steers an
    acoustically tied decode toward the corpus statistics."""
    from audio8_tpu.cli.train_ngram import main
    from audio8_tpu.ops.beam import PrefixBeamSearch
    from audio8_tpu.utils import Offsets

    wrd = tmp_path / "train.wrd"
    wrd.write_text("THE CAT SAT\n" * 20 + "THE CAT RAN\n" * 5)
    out = tmp_path / "lm.arpa"
    assert main(["--input", str(wrd), "--output", str(out),
                 "--order", "2"]) == 0

    vocab = list(Offsets.VALUES) + ["A", "C", "S", "R", "T", "E", "H",
                                    "N", "|"]
    sym = {v: i for i, v in enumerate(vocab)}
    T, V = 14, len(vocab)
    lp = np.full((T, V), -8.0, np.float32)
    for t, ch in enumerate("THE|CAT|"):
        lp[t, sym[ch]] = -0.05
    # acoustically tied S/R after THE CAT
    lp[8, sym["S"]] = -0.69
    lp[8, sym["R"]] = -0.69
    for t, ch in enumerate("A", start=9):
        lp[t, sym[ch]] = -0.05
    lp[10, sym["T"]] = -0.69
    lp[10, sym["N"]] = -0.69
    lp[11, sym["|"]] = -0.05
    for t in range(12, T):
        lp[t, Offsets.GO] = -0.01

    pbs = PrefixBeamSearch(vocab, alpha=1.2, beta=0.0, beam=12,
                           lm_file=str(out))
    got = "".join(pbs.run(lp[None], n_best=1)[0]).replace("|", " ").strip()
    assert got == "THE CAT SAT"


def test_empty_corpus_errors():
    with pytest.raises(ValueError, match="empty"):
        train_kneser_ney([], 3)


def test_reserved_tokens_rejected():
    """Literal <s>/</s>/<unk> in the corpus must error loudly (lmplz
    behavior), not silently conflate with the sentence/OOV markers."""
    for tok in (BOS, EOS, UNK):
        with pytest.raises(ValueError, match="reserved"):
            train_kneser_ney([["A", tok, "B"]], 2)


def test_deterministic_output(tmp_path):
    sents = _corpus(seed=3)
    _, p1 = _train_to_arpa(tmp_path, sents, 3)
    lm2 = train_kneser_ney(sents, 3)
    p2 = str(tmp_path / "again.arpa")
    lm2.write_arpa(p2)
    assert open(p1).read().replace("kn3", "") == open(p2).read()
