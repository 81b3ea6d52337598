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


def test_unsupported_and_corrupt_binaries_fail_actionably(tmp_path, pair):
    _, _, _ = pair
    good = tmp_path / "lm.arpa"
    good.write_text(ARPA)
    binp = tmp_path / "lm.bin"
    write_kenlm_binary(str(good), str(binp))
    blob = bytearray(binp.read_bytes())

    # flip model_type to ARRAY_TRIE (4, the -a bhiksha variant, still
    # unsupported): offset = sanity(88) + 1B order + 3 pad + 4B mult
    sanity_size = 88
    arr = bytearray(blob)
    struct.pack_into("<i", arr, sanity_size + 8, 4)
    arr_path = tmp_path / "arr.bin"
    arr_path.write_bytes(bytes(arr))
    with pytest.raises(ValueError, match="ARRAY_TRIE"):
        KenLMBinaryLM(str(arr_path))

    # a PROBING body relabeled TRIE trips the per-search layout-version
    # guard (HashedSearch kVersion 0 != TrieSearch kVersion 1) before
    # any trie parsing could mis-read the probing sections
    relabel = bytearray(blob)
    struct.pack_into("<i", relabel, sanity_size + 8, 2)
    relabel_path = tmp_path / "relabel.bin"
    relabel_path.write_bytes(bytes(relabel))
    with pytest.raises(ValueError, match="layout version"):
        KenLMBinaryLM(str(relabel_path))

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


def test_saturated_probe_tables_resolve_bounded(pair):
    """A hash table saturated with nonzero non-matching keys (corrupt
    file) must resolve lookups as OOV/not-found in at most table-size
    probes — never spin the linear probe forever (the pre-fix behavior,
    reachable at load time via the vocab spot-check)."""
    _, blm, _ = pair
    sat = np.zeros(len(blm._vocab), dtype=blm._vocab.dtype)
    sat["key"] = 12345  # every slot nonzero, none matches any real hash
    blm._vocab = sat
    blm._id_cache.clear()
    assert blm.index("zz-not-in-vocab") == 0  # bounded -> OOV

    # n-gram table probe has the same bound: a saturated middle table
    # means not-found -> backoff, not an infinite loop
    mid = np.zeros(len(blm._middles[0]), dtype=blm._middles[0].dtype)
    mid["key"] = 12345
    blm._middles[0] = mid
    assert math.isfinite(blm.logp("c", ("b",)))


def test_saturated_vocab_table_file_refused_both_readers(tmp_path, pair):
    """On-disk variant: saturate the vocab table bytes of a valid
    PROBING file. Both readers' load-time hash spot-check must REFUSE
    (bounded probe -> id mismatch), with identical accept/refuse
    semantics — and must not hang."""
    from audio8_tpu.csrc.native import NativeKenLM

    _, blm, _ = pair
    binp = tmp_path / "lm.bin"
    data = bytearray(binp.read_bytes())
    tab = blm._vocab.tobytes()
    off = bytes(data).index(tab)
    sat = np.zeros(len(blm._vocab), dtype=blm._vocab.dtype)
    sat["key"] = 0xDEADBEEF
    data[off:off + len(tab)] = sat.tobytes()
    bad = tmp_path / "sat.bin"
    bad.write_bytes(bytes(data))
    with pytest.raises(ValueError):
        KenLMBinaryLM(str(bad))
    with pytest.raises((IOError, OSError, ValueError)):
        NativeKenLM(str(bad))


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

    arr = bytearray(blob)
    struct.pack_into("<i", arr, 88 + 8, 4)  # model_type -> ARRAY_TRIE
    arr_path = tmp_path / "arr.bin"
    arr_path.write_bytes(bytes(arr))
    with pytest.raises(IOError):
        native.NativeKenLM(str(arr_path))
    # a PROBING body relabeled TRIE trips the layout-version guard
    relabel = bytearray(blob)
    struct.pack_into("<i", relabel, 88 + 8, 2)
    relabel_path = tmp_path / "relabel.bin"
    relabel_path.write_bytes(bytes(relabel))
    with pytest.raises(IOError):
        native.NativeKenLM(str(relabel_path))

    cut = tmp_path / "cut.bin"
    cut.write_bytes(bytes(blob[: len(blob) // 2]))
    with pytest.raises(IOError):
        native.NativeKenLM(str(cut))

    junk = tmp_path / "junk.bin"
    junk.write_bytes(b"RIFF" + b"\x00" * 100)
    with pytest.raises(IOError):
        native.NativeKenLM(str(junk))

    # the dispatch layer still fails actionably for array-trie files
    from audio8_tpu.ops.beam import _load_lm
    with pytest.raises(ValueError, match="ARRAY_TRIE"):
        _load_lm(str(arr_path))


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

    # counts[0] -> absurd value far past file_size/8. counts_off is
    # sanity(88) + fixed(20) = 108 — '<'-prefixed structs carry no
    # trailing pad; ALIGN8 applies after the counts array (a previous
    # version of this test packed at 112, accidentally corrupting
    # counts[1]'s low word instead of counts[0]).
    assert KenLMBinaryLM(str(binp)).counts[0] == \
        struct.unpack_from("<Q", blob, 108)[0]
    huge = bytearray(blob)
    struct.pack_into("<Q", huge, 108, 1 << 60)
    huge_path = tmp_path / "huge.bin"
    huge_path.write_bytes(bytes(huge))
    with pytest.raises(ValueError, match="implausible"):
        KenLMBinaryLM(str(huge_path))

    # magic intact but file ends mid-header
    short = tmp_path / "short.bin"
    short.write_bytes(bytes(blob[:60]))
    with pytest.raises(ValueError, match="truncated"):
        KenLMBinaryLM(str(short))

    # file ends exactly after the counts padding (136 bytes for order
    # 3): the vocab-header u64 read must raise the actionable
    # ValueError, not leak struct.error (round-4 review)
    at_counts_end = tmp_path / "counts_end.bin"
    at_counts_end.write_bytes(bytes(blob[:136]))
    with pytest.raises(ValueError, match="vocab header"):
        KenLMBinaryLM(str(at_counts_end))

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


# ---------------------------------------------------------------------------
# TRIE / QUANT_TRIE (build_binary trie [-q]): csrc/kenlm_bin.cc TrieKenLm
# + ops/kenlm_bin.py _parse_trie. Reference consumer unchanged
# (/root/reference/audio8/ctc.py:22-30 — ctcdecode's kenlm loads all
# binary subtypes transparently).


@pytest.fixture(params=["trie", "quant_trie"])
def trie_pair(request, tmp_path):
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    binp = tmp_path / f"lm.{request.param}"
    info = write_kenlm_binary(str(arpa), str(binp), search="trie",
                              quantize=request.param == "quant_trie")
    return ArpaLM(str(arpa)), KenLMBinaryLM(str(binp)), info, str(binp)


def test_trie_header_and_sorted_vocab(trie_pair):
    from audio8_tpu.ops.kenlm_bin import MODEL_QUANT_TRIE, MODEL_TRIE

    _, blm, info, _ = trie_pair
    assert blm.order == 3
    assert blm.counts == [7, 5, 3]
    assert blm.model_type in (MODEL_TRIE, MODEL_QUANT_TRIE)
    assert info["model_type"] == blm.model_type
    assert blm.bound == 7
    # ids are murmur-hash-sorted (SortedVocabulary), not ARPA order:
    # strings must hash back to their own ids and cover the vocab
    assert sorted(blm.words) == sorted(VOCAB)
    assert blm.words[0] == "<unk>"
    for wid, w in enumerate(blm.words):
        assert blm.index(w) == wid


def test_trie_logp_matches_arpa_everywhere(trie_pair):
    """Full (word, context) cross product incl. OOV words, contexts up
    to order-1: trie scoring == ARPA scoring (fp32 storage tolerance).
    The small fixture's distinct prob/backoff values fit the 8-bit
    quant tables, so QUANT_TRIE is exact here too."""
    alm, blm, _, _ = trie_pair
    probe = VOCAB + ["zzz"]
    for w in probe:
        for clen in range(3):
            for ctx in itertools.product(probe, repeat=clen):
                assert blm.logp(w, ctx) == pytest.approx(
                    alm.logp(w, ctx), abs=2e-5), (w, ctx)


def test_trie_native_matches_python(trie_pair):
    native = _native_or_skip()
    alm, blm, _, path = trie_pair
    nlm = native.NativeKenLM(path)
    probe = VOCAB + ["zzz"]
    for w in probe:
        for clen in range(3):
            for ctx in itertools.product(probe, repeat=clen):
                n = nlm.logp(w, ctx)
                assert n == pytest.approx(blm.logp(w, ctx), abs=1e-6), \
                    (w, ctx)
                assert n == pytest.approx(alm.logp(w, ctx), abs=2e-5)


def test_beam_search_trie_lm_matches_arpa_lm(tmp_path):
    """PrefixBeamSearch with a TRIE binary decodes bit-identically to
    the same model as ARPA text (same caveat as the PROBING twin: the
    fixture's <unk> has no backoff weight)."""
    from audio8_tpu.ops.beam import PrefixBeamSearch

    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    trie = tmp_path / "lm.trie"
    write_kenlm_binary(str(arpa), str(trie), search="trie")
    qtrie = tmp_path / "lm.qtrie"
    write_kenlm_binary(str(arpa), str(qtrie), search="trie", quantize=True)

    pieces = ["<s>", "<pad>", "</s>", "<unk>", "|", "a", "b", "c", "d"]
    sym = {p: i for i, p in enumerate(pieces)}
    T, V = 12, len(pieces)
    rng = np.random.default_rng(7)
    logits = rng.normal(size=(1, T, V)).astype(np.float32)
    for t, ch in enumerate("ab|bc|ab"):
        logits[0, t, sym[ch]] += 3.0
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    outs = []
    for lm_file in (str(arpa), str(trie), str(qtrie)):
        pbs = PrefixBeamSearch(pieces, alpha=0.8, beta=0.3, beam=8,
                               lm_file=lm_file)
        assert pbs.lm is not None
        outs.append(pbs.run(lp, n_best=3, return_ids=True))
    assert outs[0] == outs[1]
    assert outs[0] == outs[2]


def test_trie_quant_lossy_bins_stay_close(tmp_path):
    """With table capacity below the distinct value count the quantizer
    falls back to kenlm's equal-count bins: scores shift but stay
    within the bin spread, and every query still resolves."""
    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(11)]
    probs = {w: -float(rng.uniform(0.2, 3.0)) for w in words}
    bigrams = [(words[i], words[(i + 1) % 11]) for i in range(11)]
    text = ["\\data\\", "ngram 1=12", f"ngram 2={len(bigrams)}", "",
            "\\1-grams:", "-1.0\t<unk>"]
    for w in words:
        text.append(f"{probs[w]:.4f}\t{w}\t{-float(rng.uniform(0.1, 0.9)):.4f}")
    text += ["", "\\2-grams:"]
    for a, b in bigrams:
        text.append(f"{-float(rng.uniform(0.2, 3.0)):.4f}\t{a} {b}")
    text += ["", "\\end\\", ""]
    arpa = tmp_path / "lossy.arpa"
    arpa.write_text("\n".join(text))

    binp = tmp_path / "lossy.qtrie"
    write_kenlm_binary(str(arpa), str(binp), search="trie", quantize=True,
                       prob_bits=2, backoff_bits=3)
    alm, blm = ArpaLM(str(arpa)), KenLMBinaryLM(str(binp))
    for w in words:
        for ctx in [(), (words[0],), (words[3],)]:
            # 2-bit prob bins over a ~2.8-decade spread: generous bound
            assert blm.logp(w, ctx) == pytest.approx(
                alm.logp(w, ctx), abs=3.0), (w, ctx)


def test_trie_writer_guards(tmp_path):
    # order-1 ARPA cannot be a trie
    uni = tmp_path / "uni.arpa"
    uni.write_text(
        "\\data\\\nngram 1=2\n\n\\1-grams:\n-0.3\ta\n-0.6\tb\n\\end\\\n")
    with pytest.raises(ValueError, match="order >= 2"):
        write_kenlm_binary(str(uni), str(tmp_path / "x"), search="trie")
    # pruned (non-suffix-closed) ARPA: 2-gram "a c" exists but its
    # suffix unigram... use a 3-gram whose 2-gram suffix is missing
    pruned = tmp_path / "pruned.arpa"
    pruned.write_text(
        "\\data\\\nngram 1=4\nngram 2=1\nngram 3=1\n\n"
        "\\1-grams:\n-1.0\t<unk>\n-0.5\ta\t-0.1\n-0.5\tb\t-0.1\n"
        "-0.5\tc\t-0.1\n\n"
        "\\2-grams:\n-0.4\ta b\t-0.2\n\n"
        "\\3-grams:\n-0.3\ta b c\n\n\\end\\\n")
    with pytest.raises(ValueError, match="suffix-closed"):
        write_kenlm_binary(str(pruned), str(tmp_path / "y"), search="trie")
    # quantization is a trie-only switch
    good = tmp_path / "g.arpa"
    good.write_text(ARPA)
    with pytest.raises(ValueError, match="trie layout only"):
        write_kenlm_binary(str(good), str(tmp_path / "z"), quantize=True)


def test_trie_corrupt_files_fail_loudly(tmp_path):
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    binp = tmp_path / "lm.trie"
    write_kenlm_binary(str(arpa), str(binp), search="trie")
    blob = bytearray(binp.read_bytes())

    # truncation anywhere in the body -> loud failure, not mis-scoring
    for frac in (0.3, 0.6, 0.9):
        cut = tmp_path / f"cut{frac}.trie"
        cut.write_bytes(bytes(blob[: int(len(blob) * frac)]))
        with pytest.raises(ValueError):
            KenLMBinaryLM(str(cut))

    # unsorted vocab hashes -> refused (binary search would mis-resolve)
    bad = bytearray(blob)
    voc_off = 88 + 20 + 8 * 3
    voc_off = (voc_off + 7) // 8 * 8 + 8  # skip counts pad + n header
    bad[voc_off:voc_off + 8], bad[voc_off + 8:voc_off + 16] = \
        bad[voc_off + 8:voc_off + 16], bad[voc_off:voc_off + 8]
    badp = tmp_path / "bad.trie"
    badp.write_bytes(bytes(bad))
    with pytest.raises(ValueError, match="strictly"):
        KenLMBinaryLM(str(badp))

    native = _native_or_skip()
    for p in (tmp_path / "cut0.3.trie", badp):
        if p.exists():
            with pytest.raises(IOError):
                native.NativeKenLM(str(p))


def test_cli_build_binary_trie(tmp_path):
    from audio8_tpu.cli.build_binary import main
    from audio8_tpu.ops.kenlm_bin import MODEL_QUANT_TRIE, MODEL_TRIE

    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    alm = ArpaLM(str(arpa))
    out = tmp_path / "lm.trie"
    assert main([str(arpa), str(out), "--trie"]) == 0
    blm = KenLMBinaryLM(str(out))
    assert blm.model_type == MODEL_TRIE
    assert blm.logp("b", ("<s>", "a")) == pytest.approx(
        alm.logp("b", ("<s>", "a")), abs=2e-5)
    outq = tmp_path / "lm.qtrie"
    assert main([str(arpa), str(outq), "--trie", "--quantize",
                 "--prob_bits", "8", "--backoff_bits", "8"]) == 0
    blmq = KenLMBinaryLM(str(outq))
    assert blmq.model_type == MODEL_QUANT_TRIE
    assert blmq.logp("c", ("a", "b")) == pytest.approx(
        alm.logp("c", ("a", "b")), abs=2e-5)


def test_trained_kn_trie_roundtrip(tmp_path):
    """Realistic-size trie: a trained KN LM (hundreds of bigrams,
    >1000 trigrams) builds and scores as TRIE and QUANT_TRIE.
    Regression: the counts-plausibility ceiling assumed >= 8 bytes per
    n-gram, which a legitimate QUANT_TRIE (a couple of *bits* per
    entry) violates — caught driving the CLI end-to-end."""
    from audio8_tpu.ops.ngram import train_kneser_ney

    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(30)]
    sents = [[vocab[j] for j in rng.integers(0, 30, size=rng.integers(3, 9))]
             for _ in range(300)]
    lm = train_kneser_ney(sents, order=3)
    arpa = tmp_path / "kn.arpa"
    lm.write_arpa(str(arpa))
    alm = ArpaLM(str(arpa))
    for name, q, tol in [("kn.trie", False, 1e-3), ("kn.qtrie", True, 0.5)]:
        binp = tmp_path / name
        info = write_kenlm_binary(str(arpa), str(binp), search="trie",
                                  quantize=q)
        assert info["counts"][2] > 1000  # the regression regime
        blm = KenLMBinaryLM(str(binp))
        for _ in range(30):
            seq = [vocab[j] for j in rng.integers(0, 30, size=6)]
            assert blm.score_sequence(seq) == pytest.approx(
                alm.score_sequence(seq), abs=tol * len(seq)), (name, seq)
    try:
        native = _native_or_skip()
    except Exception:
        return
    nlm = native.NativeKenLM(str(tmp_path / "kn.qtrie"))
    blm = KenLMBinaryLM(str(tmp_path / "kn.qtrie"))
    for _ in range(20):
        w = vocab[int(rng.integers(0, 30))]
        ctx = tuple(vocab[j] for j in rng.integers(0, 30, size=2))
        assert nlm.logp(w, ctx) == pytest.approx(blm.logp(w, ctx), abs=1e-6)


def test_fuzz_formats_match_arpa_and_each_other(tmp_path):
    """Property fuzz over random trained LMs: for random orders (2..5),
    vocab sizes, and unicode-heavy vocabularies, every binary format
    (PROBING, TRIE, QUANT_TRIE-with-lossless-width) scores identically
    to the ARPA oracle (fp32 tolerance) through BOTH the Python and the
    native C++ readers, on random queries including OOV words and
    over-long contexts."""
    from audio8_tpu.ops.ngram import train_kneser_ney

    try:
        native = _native_or_skip()
    except Exception:
        native = None
    rng = np.random.default_rng(20260820)
    base_words = (["the", "a", "of", "café", "naïve", "日本語", "données",
                   "a'postrophe", 'qu"ote', "x" * 60] +
                  [f"w{i}" for i in range(40)])
    for trial in range(3):
        order = int(rng.integers(2, 6))
        vsize = int(rng.integers(8, len(base_words)))
        vocab = list(rng.choice(base_words, size=vsize, replace=False))
        sents = [[vocab[j] for j in rng.integers(0, vsize,
                                                 size=rng.integers(2, 9))]
                 for _ in range(120)]
        lm = train_kneser_ney(sents, order=order)
        arpa = tmp_path / f"f{trial}.arpa"
        lm.write_arpa(str(arpa))
        alm = ArpaLM(str(arpa))

        readers = []
        for name, kw in [("probing", {}),
                         ("trie", dict(search="trie")),
                         ("qtrie", dict(search="trie", quantize=True,
                                        prob_bits=16, backoff_bits=16))]:
            p = tmp_path / f"f{trial}.{name}"
            write_kenlm_binary(str(arpa), str(p), **kw)
            readers.append((name, KenLMBinaryLM(str(p))))
            if native is not None:
                readers.append((name + "-native",
                                native.NativeKenLM(str(p))))

        probe = vocab + ["OOVWORD", "zzz"]
        for _ in range(120):
            w = probe[int(rng.integers(0, len(probe)))]
            clen = int(rng.integers(0, order + 1))  # incl. over-long
            ctx = tuple(probe[j] for j in rng.integers(0, len(probe),
                                                       size=clen))
            want = alm.logp(w, ctx)
            for name, r in readers:
                got = r.logp(w, ctx)
                assert got == pytest.approx(want, abs=3e-5), \
                    (trial, order, name, w, ctx, got, want)


def test_fuzz_truncation_always_fails_loudly(tmp_path):
    """The fail-loud contract, fuzzed over truncation points: a strict
    truncation of a binary model either refuses to load (ValueError /
    native IOError) or loads AND scores identically to the ARPA oracle.
    No cut point may load and mis-score. (Cuts that load harmlessly do
    exist: exactly at the scoring-body end — dropping the optional
    vocab-string tail — and at size-1, which only drops the final
    string NUL terminator.)"""
    from audio8_tpu.ops.ngram import train_kneser_ney

    try:
        native = _native_or_skip()
    except Exception:
        native = None
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(20)]
    sents = [[vocab[j] for j in rng.integers(0, 20,
                                             size=rng.integers(3, 8))]
             for _ in range(100)]
    lm = train_kneser_ney(sents, order=3)
    arpa = tmp_path / "t.arpa"
    lm.write_arpa(str(arpa))
    alm = ArpaLM(str(arpa))

    for name, kw in [("probing", {}), ("trie", dict(search="trie")),
                     ("qtrie", dict(search="trie", quantize=True))]:
        p = tmp_path / f"t.{name}"
        write_kenlm_binary(str(arpa), str(p), **kw)
        blob = p.read_bytes()
        # locate the scoring-body end: the start of the vocab-string
        # tail, which begins with "<unk>\0"
        body_end = blob.rfind(b"<unk>\x00")
        assert 0 < body_end < len(blob)
        cuts = sorted(set(
            list(rng.integers(1, len(blob), size=30)) +
            [body_end - 1, body_end, body_end + 1, len(blob) - 1]))
        queries = [("w3", ()), ("w1", ("w2",)), ("zz", ("w4", "w5")),
                   ("w8", ("w1", "w17"))]
        tol = 0.5 if name == "qtrie" else 3e-5
        for cut in cuts:
            cp = tmp_path / f"cut.{name}"
            cp.write_bytes(blob[:cut])
            try:
                r = KenLMBinaryLM(str(cp))
            except ValueError:
                if native is not None:
                    with pytest.raises(IOError):
                        native.NativeKenLM(str(cp))
                continue
            # it loaded: it must be a semantically identical model (the
            # only benign cuts shave the optional string tail / its
            # final NUL) — and the native reader must agree with it
            for w, ctx in queries:
                assert r.logp(w, ctx) == pytest.approx(
                    alm.logp(w, ctx), abs=tol), (name, cut, w, ctx)
            if native is not None:
                try:
                    n = native.NativeKenLM(str(cp))
                except IOError:
                    continue  # native may be stricter, never looser
                for w, ctx in queries:
                    assert n.logp(w, ctx) == pytest.approx(
                        alm.logp(w, ctx), abs=tol), (name, cut, w, ctx)


def test_trie_pointer_and_order_corruption_refused(tmp_path):
    """Regression (round-4 review): a corrupt trie must refuse at load,
    never crash or silently mis-score at query time. Corrupting one
    unigram child-pointer pair used to pass every load check, then
    SIGSEGV the native reader (binary search over [0, 2^34)) and
    silently mis-score the Python one; unsorted words within a node
    used to mis-score via a missed binary-search match."""
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    binp = tmp_path / "lm.trie"
    write_kenlm_binary(str(arpa), str(binp), search="trie")
    blob = bytes(binp.read_bytes())
    order = blob[88]
    counts = struct.unpack_from("<QQQ", blob, 108)
    uni_off = ((108 + 8 * order + 7) // 8 * 8) + 8 + 8 * counts[0]

    # (a) non-monotone / out-of-bounds child pointers
    bad = bytearray(blob)
    struct.pack_into("<Q", bad, uni_off + 3 * 16 + 8, 0)
    struct.pack_into("<Q", bad, uni_off + 4 * 16 + 8, 2 ** 34)
    p = tmp_path / "bad_ptr.trie"
    p.write_bytes(bytes(bad))
    with pytest.raises(ValueError, match="nondecreasing"):
        KenLMBinaryLM(str(p))

    # (b) words unsorted within a node's child range: swap the first
    # two bigram entries' word fields (same parent node). Middle entry
    # layout: word_bits | prob31 | backoff32 | next_bits at bit i*total
    word_bits = counts[0].bit_length()
    next_bits = counts[2].bit_length()
    total = word_bits + 63 + next_bits
    mid_off = uni_off + (counts[0] + 2) * 16
    sec = bytearray(blob)

    def rdw(i):
        bit = 8 * mid_off + i * total
        window = int.from_bytes(sec[bit // 8: bit // 8 + 8], "little")
        return (window >> (bit % 8)) & ((1 << word_bits) - 1)

    def wrw(i, val):
        bit = 8 * mid_off + i * total
        byte, shift = bit // 8, bit % 8
        cur = int.from_bytes(sec[byte:byte + 8], "little")
        mask = ((1 << word_bits) - 1) << shift
        cur = (cur & ~mask) | (val << shift)
        sec[byte:byte + 8] = cur.to_bytes(8, "little")

    # find a parent with >= 2 children via the unigram pointers
    uni_next = [struct.unpack_from("<Q", blob, uni_off + i * 16 + 8)[0]
                for i in range(counts[0] + 1)]
    pair = next((b0 for b0, e in zip(uni_next, uni_next[1:]) if e - b0 >= 2),
                None)
    assert pair is not None
    w0, w1 = rdw(pair), rdw(pair + 1)
    wrw(pair, w1)
    wrw(pair + 1, w0)
    q = tmp_path / "bad_order.trie"
    q.write_bytes(bytes(sec))
    with pytest.raises(ValueError, match="sorted within"):
        KenLMBinaryLM(str(q))

    try:
        native = _native_or_skip()
    except Exception:
        return
    for f in (p, q):
        with pytest.raises(IOError):
            native.NativeKenLM(str(f))
