"""ARPA LM parsing/backoff and LM-fused prefix beam search."""
import math

import numpy as np
import pytest

from audio8_tpu.ops.beam import PrefixBeamSearch, _prefix_beam_search_py
from audio8_tpu.ops.lm import ArpaLM
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


@pytest.fixture
def lm(tmp_path):
    f = tmp_path / "lm.arpa"
    f.write_text(ARPA)
    return ArpaLM(str(f))


def test_arpa_parse_and_unigram(lm):
    assert lm.order == 2
    np.testing.assert_allclose(lm.logp("CAT", ()), -0.30103 * math.log(10), rtol=1e-6)
    # OOV -> <unk>
    np.testing.assert_allclose(lm.logp("ZEBRA", ()), -1.30103 * math.log(10), rtol=1e-6)


def test_arpa_bigram_and_backoff(lm):
    # direct bigram
    np.testing.assert_allclose(lm.logp("CAT", ("THE",)), -0.17609 * math.log(10), rtol=1e-6)
    # backoff: P(DOG | THE) = backoff(THE) * P(DOG)
    want = (-0.17609 + -0.69897) * math.log(10)
    np.testing.assert_allclose(lm.logp("DOG", ("THE",)), want, rtol=1e-6)


def test_lm_fusion_steers_beam(tmp_path):
    """Acoustically ambiguous CAT vs CAS: the LM should pick CAT."""
    f = tmp_path / "lm.arpa"
    f.write_text(ARPA)
    vocab = list(Offsets.VALUES) + ["A", "C", "S", "T", "|"]
    sym = {v: i for i, v in enumerate(vocab)}
    T = 8
    V = len(vocab)
    lp = np.full((T, V), -8.0, np.float32)

    def put(t, ch, p):
        lp[t, sym[ch]] = p

    blank = Offsets.GO
    # C A ?(T/S tie) |
    put(0, "C", -0.1); put(1, "A", -0.1)
    lp[2, sym["T"]] = -0.69; lp[2, sym["S"]] = -0.69  # tie
    put(3, "|", -0.1)
    for t in range(4, T):
        lp[t, blank] = -0.01

    pbs_no_lm = PrefixBeamSearch(vocab, alpha=0.0, beta=0.0, beam=8)
    pbs_lm = PrefixBeamSearch(vocab, alpha=1.0, beta=0.0, beam=8,
                              lm_file=str(f))
    with_lm = "".join(pbs_lm.run(lp[None], n_best=1)[0]).replace("|", "").strip()
    assert with_lm == "CAT"
    # n-best without LM contains both hypotheses near the top
    nb = pbs_no_lm.run(lp[None], n_best=4, return_ids=True)[0]
    texts = {"".join(vocab[i] for i in seq) for seq in nb}
    assert any("CAT" in t.replace(" ", "") for t in texts)
    assert any("CAS" in t.replace(" ", "") for t in texts)


ARPA3 = """\\data\\
ngram 1=4
ngram 2=1
ngram 3=1

\\1-grams:
-1.00000\tA\t-0.50000
-1.00000\tB\t-0.40000
-1.20000\tC
-1.30103\t<unk>

\\2-grams:
-0.30000\tA B\t-0.20000

\\3-grams:
-0.10000\tA B A

\\end\\
"""


def test_backoff_accumulates_across_levels(tmp_path):
    """P(C | A, B): the trigram (A,B,C) and bigram (B,C) are both
    missing, so BOTH backoff weights apply — bo(A,B) + bo(B) + P(C) —
    kenlm semantics. A scorer that drops backoff accumulated before the
    last shortening returns bo(B) + P(C) and fails this."""
    f = tmp_path / "lm3.arpa"
    f.write_text(ARPA3)
    py = ArpaLM(str(f))
    assert py.order == 3
    want = (-0.2 + -0.4 + -1.2) * math.log(10)
    np.testing.assert_allclose(py.logp("C", ("A", "B")), want, rtol=1e-6)
    # OOV through two backoff levels: bo(A,B) + bo(B) + P(<unk>)
    want_unk = (-0.2 + -0.4 + -1.30103) * math.log(10)
    np.testing.assert_allclose(py.logp("Z", ("A", "B")), want_unk, rtol=1e-6)
    native = pytest.importorskip("audio8_tpu.csrc.native")
    cc = native.NativeArpaLM(str(f))
    for word, ctx in [("C", ("A", "B")), ("Z", ("A", "B")), ("B", ("A",)),
                      ("A", ("A", "B")), ("C", ("B",))]:
        np.testing.assert_allclose(cc.logp(word, ctx), py.logp(word, ctx),
                                   rtol=1e-5, atol=1e-5)


def test_native_arpa_lm_matches_python(tmp_path):
    native = pytest.importorskip("audio8_tpu.csrc.native")
    f = tmp_path / "lm.arpa"
    f.write_text(ARPA)
    py = ArpaLM(str(f))
    cc = native.NativeArpaLM(str(f))
    for word, ctx in [("CAT", ()), ("CAT", ("THE",)), ("DOG", ("THE",)),
                      ("ZEBRA", ()), ("SAT", ("CAT",)), ("SAT", ("THE", "CAT"))]:
        np.testing.assert_allclose(cc.logp(word, ctx), py.logp(word, ctx),
                                   rtol=1e-5, atol=1e-5)


def test_native_lm_beam_matches_python_lm_beam(tmp_path):
    native = pytest.importorskip("audio8_tpu.csrc.native")
    f = tmp_path / "lm.arpa"
    f.write_text(ARPA)
    vocab = list(Offsets.VALUES) + ["A", "C", "S", "T", "|"]
    sym = {v: i for i, v in enumerate(vocab)}
    T, V = 8, len(vocab)
    lp = np.full((T, V), -8.0, np.float32)
    blank = Offsets.GO
    lp[0, sym["C"]] = -0.1; lp[1, sym["A"]] = -0.1
    lp[2, sym["T"]] = -0.69; lp[2, sym["S"]] = -0.69
    lp[3, sym["|"]] = -0.1
    for t in range(4, T):
        lp[t, blank] = -0.01

    pbs = PrefixBeamSearch(vocab, alpha=1.0, beta=0.0, beam=8, lm_file=str(f))
    assert isinstance(pbs.lm, native.NativeArpaLM)
    got = "".join(pbs.run(lp[None], n_best=1)[0]).replace("|", "").strip()
    assert got == "CAT"

    # decode parity vs the Python LM beam on random inputs
    from audio8_tpu.ops.beam import _prefix_beam_search_py
    py_lm = ArpaLM(str(f))
    pieces = [v if v != "|" else " " for v in vocab]
    rng = np.random.default_rng(5)
    for _ in range(3):
        logits = rng.normal(size=(10, V)) * 2
        lpr = (logits - np.log(np.exp(logits).sum(-1, keepdims=True))).astype(np.float32)
        want = _prefix_beam_search_py(lpr, blank, 8, sym["|"], 0.8, 0.3,
                                      py_lm, pieces)
        got = native.prefix_beam_search_lm(lpr, blank, 8, sym["|"], 0.8, 0.3,
                                           pieces, pbs.lm)
        assert got[0] == want[0]


def test_kenlm_binary_never_garbled_parses_as_arpa(tmp_path):
    """A KenLM *binary* model (the artifact the reference feeds ctcdecode,
    /root/reference/audio8/ctc.py:22-30) must never garbled-parse as ARPA
    text: ArpaLM rejects it outright, and a corrupt/unsupported binary
    fails the binary loader's sanity checks actionably (valid PROBING
    binaries load — tests/test_kenlm_bin.py)."""
    from audio8_tpu.ops.beam import _load_lm
    from audio8_tpu.ops.lm import KENLM_BINARY_MAGIC

    f = tmp_path / "lm.klm"
    f.write_bytes(KENLM_BINARY_MAGIC + b" 5\n\0" + b"\x00" * 64)
    with pytest.raises(ValueError, match="KenLM binary"):
        ArpaLM(str(f))
    # zeroed sanity floats = incompatible layout -> actionable error
    with pytest.raises(ValueError, match="ARPA|sanity"):
        _load_lm(str(f))
    with pytest.raises(ValueError, match="ARPA|sanity"):
        PrefixBeamSearch(["<s>", "<pad>", "</s>", "<unk>", "|", "A"],
                         lm_file=str(f))


def test_gzipped_arpa_still_loads(tmp_path):
    """The binary sniff must not break gzipped ARPA text."""
    import gzip

    f = tmp_path / "lm.arpa.gz"
    with gzip.open(str(f), "wt") as g:
        g.write(ARPA)
    lm = ArpaLM(str(f))
    assert lm.order >= 1
