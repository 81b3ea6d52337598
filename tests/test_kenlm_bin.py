"""KenLM binary (PROBING) reader/writer: roundtrip differential vs ARPA,
format guards, and beam-search integration.

kenlm itself is absent in this environment, so the format is validated
by writer<->reader roundtrip (shared layout constants) plus structural
sanity guards; the differential oracle is our ARPA scorer, which is
itself differential-tested against the C++ reader (test_lm_beam.py).
Reference consumer: /root/reference/audio8/ctc.py:22-30 (ctcdecode
loads KenLM binaries for PrefixBeamSearch fusion).
"""
import itertools
import math
import struct

import numpy as np
import pytest

from audio8_tpu.ops.kenlm_bin import (
    KenLMBinaryLM, combine_word_hash, murmur_hash64a, ngram_key,
    write_kenlm_binary)
from audio8_tpu.ops.lm import LOG10, ArpaLM

ARPA = """\\data\\
ngram 1=7
ngram 2=5
ngram 3=3

\\1-grams:
-1.0\t<unk>
-0.60206\t<s>\t-0.30103
-0.60206\t</s>
-0.39794\ta\t-0.20412
-0.52288\tb\t-0.1
-0.69897\tc\t-0.05
-0.90309\td

\\2-grams:
-0.30103\t<s> a\t-0.30103
-0.17609\ta b\t-0.2
-0.39794\tb c\t-0.15
-0.52288\tc </s>
-0.69897\ta c\t-0.1

\\3-grams:
-0.10914\t<s> a b
-0.21085\ta b c
-0.30103\tb c </s>

\\end\\
"""

VOCAB = ["<unk>", "<s>", "</s>", "a", "b", "c", "d"]


@pytest.fixture
def pair(tmp_path):
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    binp = tmp_path / "lm.bin"
    info = write_kenlm_binary(str(arpa), str(binp))
    return ArpaLM(str(arpa)), KenLMBinaryLM(str(binp)), info


def test_header_roundtrip(pair):
    _, blm, info = pair
    assert blm.order == 3
    assert blm.counts == [7, 5, 3]
    assert info["counts"] == [7, 5, 3]
    # <unk> is id 0 and not hash-table-inserted; 6 other words follow
    assert blm.bound == 7
    assert blm.words == VOCAB


def test_logp_matches_arpa_everywhere(pair):
    """Every (word, context) combo over the vocab, contexts up to
    order-1: binary scoring == ARPA scoring (fp32 storage tolerance).
    In-vocab only: OOV semantics differ by design (kenlm id-0 mapping
    finds <unk>-containing n-grams ARPA string-lookup cannot)."""
    alm, blm, _ = pair
    words = VOCAB
    for w in words:
        for clen in range(3):
            for ctx in itertools.product(words, repeat=clen):
                a = alm.logp(w, ctx)
                b = blm.logp(w, ctx)
                assert b == pytest.approx(a, abs=2e-5), (w, ctx)


def test_oov_maps_to_unk(pair):
    alm, blm, _ = pair
    # OOV target: <unk> unigram prob (same value both readers here)
    assert blm.logp("zzz", ()) == pytest.approx(-1.0 * LOG10, abs=2e-5)
    assert blm.logp("zzz", ("a",)) == pytest.approx(
        alm.logp("<unk>", ("a",)), abs=2e-5)
    # OOV context word becomes <unk> in the context chain
    got = blm.logp("a", ("zzz",))
    assert got == pytest.approx(blm.logp("a", ("<unk>",)), abs=2e-5)


def test_index_and_hash_helpers(pair):
    _, blm, _ = pair
    assert blm.index("<unk>") == 0
    assert blm.index("oov-word") == 0
    ids = [blm.index(w) for w in VOCAB[1:]]
    assert sorted(ids) == list(range(1, 7))  # dense, ARPA order
    # chain identity: key(w1..wn) extends key(w2..wn) by w1
    k2 = ngram_key((ids[0], ids[1]))
    assert ngram_key((ids[3], ids[0], ids[1])) == \
        combine_word_hash(k2, ids[3])
    # murmur is pure and length-sensitive
    assert murmur_hash64a(b"abc") == murmur_hash64a(b"abc")
    assert murmur_hash64a(b"abc") != murmur_hash64a(b"abcd")


def test_score_sequence_matches(pair):
    alm, blm, _ = pair
    seq = ["<s>", "a", "b", "c", "</s>"]
    assert blm.score_sequence(seq) == pytest.approx(
        alm.score_sequence(seq), abs=1e-4)


def test_trained_kn_lm_roundtrip(tmp_path):
    """End-to-end with a real estimated LM: a8t-train-ngram ARPA ->
    binary, scores agree on held-out word sequences incl. backoff-heavy
    unseen n-grams."""
    from audio8_tpu.ops.ngram import train_kneser_ney

    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(25)]
    sents = [[vocab[j] for j in rng.integers(0, 25, size=rng.integers(3, 9))]
             for _ in range(200)]
    lm = train_kneser_ney(sents, order=3)
    arpa = tmp_path / "kn.arpa"
    lm.write_arpa(str(arpa))
    binp = tmp_path / "kn.bin"
    write_kenlm_binary(str(arpa), str(binp))
    alm, blm = ArpaLM(str(arpa)), KenLMBinaryLM(str(binp))
    for _ in range(50):
        seq = [vocab[j] for j in rng.integers(0, 25, size=6)]
        assert blm.score_sequence(seq) == pytest.approx(
            alm.score_sequence(seq), abs=1e-3), seq


def test_beam_search_binary_lm_matches_arpa_lm(tmp_path):
    """PrefixBeamSearch with lm.bin decodes identically to lm.arpa.

    The fixture's <unk> carries no backoff weight: for OOV words (which
    letter-level beam hypotheses produce constantly) kenlm id-0 mapping
    applies <unk>'s backoff where ARPA string lookup backs off free, so
    a nonzero <unk> backoff would make the two scorers *correctly*
    disagree on OOV-heavy prefixes."""
    from audio8_tpu.ops.beam import PrefixBeamSearch
    from audio8_tpu.utils import Offsets

    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    binp = tmp_path / "lm.bin"
    write_kenlm_binary(str(arpa), str(binp))

    pieces = ["<s>", "<pad>", "</s>", "<unk>", "|", "a", "b", "c", "d"]
    sym = {p: i for i, p in enumerate(pieces)}
    T, V = 12, len(pieces)
    rng = np.random.default_rng(7)
    logits = rng.normal(size=(1, T, V)).astype(np.float32)
    for t, ch in enumerate("ab|bc|ab"):
        logits[0, t, sym[ch]] += 3.0
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    outs = []
    for lm_file in (str(arpa), str(binp)):
        pbs = PrefixBeamSearch(pieces, alpha=0.8, beta=0.3, beam=8,
                               lm_file=lm_file)
        assert pbs.lm is not None
        outs.append(pbs.run(lp, n_best=3, return_ids=True))
    assert outs[0] == outs[1]
    # binary files route to the native mmap'd reader when the library is
    # built (the usual case here), else the pure-Python PROBING reader
    lm = PrefixBeamSearch(pieces, lm_file=str(binp)).lm
    try:
        from audio8_tpu.csrc import native

        assert isinstance(lm, (native.NativeKenLM, KenLMBinaryLM))
    except ImportError:
        assert isinstance(lm, KenLMBinaryLM)


def test_trie_and_corrupt_binaries_fail_actionably(tmp_path, pair):
    _, _, _ = pair
    good = tmp_path / "lm.arpa"
    good.write_text(ARPA)
    binp = tmp_path / "lm.bin"
    write_kenlm_binary(str(good), str(binp))
    blob = bytearray(binp.read_bytes())

    # flip model_type to TRIE (2): offset = sanity(88) + 1B order + 3 pad + 4B mult
    sanity_size = 88
    trie = bytearray(blob)
    struct.pack_into("<i", trie, sanity_size + 8, 2)
    trie_path = tmp_path / "trie.bin"
    trie_path.write_bytes(bytes(trie))
    with pytest.raises(ValueError, match="TRIE"):
        KenLMBinaryLM(str(trie_path))

    # truncated body -> section/size inconsistency, not silent mis-scoring
    cut = tmp_path / "cut.bin"
    cut.write_bytes(bytes(blob[: len(blob) // 2]))
    with pytest.raises(ValueError):
        KenLMBinaryLM(str(cut))

    # not a kenlm file at all
    junk = tmp_path / "junk.bin"
    junk.write_bytes(b"RIFF" + b"\x00" * 100)
    with pytest.raises(ValueError, match="not a KenLM"):
        KenLMBinaryLM(str(junk))


def test_cli_build_binary(tmp_path):
    from audio8_tpu.cli.build_binary import main

    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    out = tmp_path / "lm.klm"
    assert main([str(arpa), str(out), "-p", "2.0"]) == 0
    blm = KenLMBinaryLM(str(out))
    alm = ArpaLM(str(arpa))
    assert blm.logp("b", ("<s>", "a")) == pytest.approx(
        alm.logp("b", ("<s>", "a")), abs=2e-5)


def test_no_unk_arpa_gets_floor(tmp_path):
    """ARPA without <unk>: id 0 row synthesizes kenlm's -100 floor."""
    arpa = tmp_path / "nounk.arpa"
    arpa.write_text(
        "\\data\\\nngram 1=2\n\n\\1-grams:\n-0.3\ta\n-0.6\tb\n\\end\\\n")
    binp = tmp_path / "nounk.bin"
    write_kenlm_binary(str(arpa), str(binp))
    blm = KenLMBinaryLM(str(binp))
    assert blm.logp("zzz", ()) == pytest.approx(-100.0 * LOG10, abs=1e-3)
    assert blm.logp("a", ()) == pytest.approx(-0.3 * LOG10, abs=2e-5)


# ---------------------------------------------------------------------------
# Native (C++) PROBING reader: csrc/kenlm_bin.cc


def _native_or_skip():
    try:
        from audio8_tpu.csrc import native
    except ImportError:
        pytest.skip("native library not built")
    if not hasattr(native, "NativeKenLM"):
        pytest.skip("native KenLM reader not in this build")
    return native


def test_native_kenlm_matches_python_everywhere(pair, tmp_path):
    """C++ mmap reader == Python reader == ARPA scorer over the full
    in-vocab (word, context) grid, contexts up to order-1."""
    native = _native_or_skip()
    alm, blm, _ = pair
    arpa = tmp_path / "n.arpa"
    arpa.write_text(ARPA)
    binp = tmp_path / "n.bin"
    write_kenlm_binary(str(arpa), str(binp))
    nlm = native.NativeKenLM(str(binp))
    pylm = KenLMBinaryLM(str(binp))
    for w in VOCAB:
        for clen in range(3):
            for ctx in itertools.product(VOCAB, repeat=clen):
                n = nlm.logp(w, ctx)
                assert n == pytest.approx(pylm.logp(w, ctx), abs=2e-5), \
                    (w, ctx)
                assert n == pytest.approx(alm.logp(w, ctx), abs=2e-5)


def test_native_kenlm_oov_semantics(tmp_path):
    """OOV word and OOV context words map to <unk> (id 0), matching the
    Python reader and kenlm."""
    native = _native_or_skip()
    arpa = tmp_path / "o.arpa"
    arpa.write_text(ARPA)
    binp = tmp_path / "o.bin"
    write_kenlm_binary(str(arpa), str(binp))
    nlm = native.NativeKenLM(str(binp))
    pylm = KenLMBinaryLM(str(binp))
    assert nlm.logp("zzz", ()) == pytest.approx(-1.0 * LOG10, abs=2e-5)
    assert nlm.logp("a", ("zzz",)) == pytest.approx(
        pylm.logp("a", ("zzz",)), abs=2e-5)
    assert nlm.logp("zzz", ("a", "qqq")) == pytest.approx(
        pylm.logp("zzz", ("a", "qqq")), abs=2e-5)


def test_native_kenlm_rejects_bad_files(tmp_path):
    """Trie-typed, truncated, and non-kenlm files raise IOError from the
    native loader (callers then surface the Python reader's actionable
    message via ops.beam._load_lm)."""
    native = _native_or_skip()
    arpa = tmp_path / "r.arpa"
    arpa.write_text(ARPA)
    binp = tmp_path / "r.bin"
    write_kenlm_binary(str(arpa), str(binp))
    blob = bytearray(binp.read_bytes())

    trie = bytearray(blob)
    struct.pack_into("<i", trie, 88 + 8, 2)  # model_type -> TRIE
    trie_path = tmp_path / "trie.bin"
    trie_path.write_bytes(bytes(trie))
    with pytest.raises(IOError):
        native.NativeKenLM(str(trie_path))

    cut = tmp_path / "cut.bin"
    cut.write_bytes(bytes(blob[: len(blob) // 2]))
    with pytest.raises(IOError):
        native.NativeKenLM(str(cut))

    junk = tmp_path / "junk.bin"
    junk.write_bytes(b"RIFF" + b"\x00" * 100)
    with pytest.raises(IOError):
        native.NativeKenLM(str(junk))

    # the dispatch layer still fails actionably for trie files
    from audio8_tpu.ops.beam import _load_lm
    with pytest.raises(ValueError, match="TRIE"):
        _load_lm(str(trie_path))


def test_native_beam_search_consumes_binary_lm_in_process(tmp_path):
    """With the native library built, a .bin LM runs through the C++
    LM-fused beam search (no Python scoring callback) and decodes
    identically to the same model as ARPA text."""
    native = _native_or_skip()
    from audio8_tpu.ops.beam import PrefixBeamSearch

    arpa = tmp_path / "e.arpa"
    arpa.write_text(ARPA)
    binp = tmp_path / "e.bin"
    write_kenlm_binary(str(arpa), str(binp))

    pieces = ["<s>", "<pad>", "</s>", "<unk>", "|", "a", "b", "c", "d"]
    sym = {p: i for i, p in enumerate(pieces)}
    T, V = 14, len(pieces)
    rng = np.random.default_rng(11)
    logits = rng.normal(size=(1, T, V)).astype(np.float32)
    for t, ch in enumerate("ab|abc|bc|a"):
        logits[0, t, sym[ch]] += 3.0
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    pbs_bin = PrefixBeamSearch(pieces, alpha=0.7, beta=0.2, beam=8,
                               lm_file=str(binp))
    assert isinstance(pbs_bin.lm, native.NativeKenLM)
    pbs_arpa = PrefixBeamSearch(pieces, alpha=0.7, beta=0.2, beam=8,
                                lm_file=str(arpa))
    assert pbs_bin.run(lp, n_best=3, return_ids=True) == \
        pbs_arpa.run(lp, n_best=3, return_ids=True)

def test_corrupt_counts_and_short_headers_fail_actionably(tmp_path):
    """Hardening (ADVICE r3): crafted counts[] and truncated headers must
    raise the actionable ValueError, not struct.error/SIGFPE/OOB reads."""
    arpa = tmp_path / "h.arpa"
    arpa.write_text(ARPA)
    binp = tmp_path / "h.bin"
    write_kenlm_binary(str(arpa), str(binp))
    blob = bytearray(binp.read_bytes())

    # counts[0] -> absurd value far past file_size/8
    huge = bytearray(blob)
    struct.pack_into("<Q", huge, 112, 1 << 60)  # counts_off = 88+20+4pad
    huge_path = tmp_path / "huge.bin"
    huge_path.write_bytes(bytes(huge))
    with pytest.raises(ValueError, match="implausible"):
        KenLMBinaryLM(str(huge_path))

    # magic intact but file ends mid-header
    short = tmp_path / "short.bin"
    short.write_bytes(bytes(blob[:60]))
    with pytest.raises(ValueError, match="truncated"):
        KenLMBinaryLM(str(short))

    # native loader: same crafted files must return load failure, never
    # crash the process
    try:
        native = _native_or_skip()
    except Exception:
        return
    with pytest.raises(IOError):
        native.NativeKenLM(str(huge_path))
    with pytest.raises(IOError):
        native.NativeKenLM(str(short))


def test_vocab_string_shortfall_fails_loudly(tmp_path):
    """A has_vocab file whose trailing string section does not hold
    exactly `bound` words is refused (section-layout shortfall would
    otherwise be absorbed as garbage vocab)."""
    arpa = tmp_path / "v.arpa"
    arpa.write_text(ARPA)
    binp = tmp_path / "v.bin"
    write_kenlm_binary(str(arpa), str(binp))
    blob = bytearray(binp.read_bytes())

    # chop one trailing vocab string off
    cut_at = bytes(blob).rfind(b"\x00", 0, len(blob) - 1)
    shortv = tmp_path / "shortv.bin"
    shortv.write_bytes(bytes(blob[:cut_at + 1]))
    with pytest.raises(ValueError, match="vocab string section"):
        KenLMBinaryLM(str(shortv))

    try:
        native = _native_or_skip()
    except Exception:
        return
    with pytest.raises(IOError):
        native.NativeKenLM(str(shortv))
