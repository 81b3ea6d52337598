"""KenLM *binary* language models: a PROBING-format reader and writer.

The reference hands ``lm_file`` straight to ctcdecode, whose bundled
kenlm loads both ARPA text and KenLM binary models — the format LM
artifacts usually ship in (/root/reference/audio8/ctc.py:22-30,
test.py:94-104). This module implements KenLM's on-disk binary format
("mmap lm ... format version 5", kenlm lm/binary_format.cc) for the
PROBING search type from the published layout:

  [Sanity header][FixedWidthParameters][uint64 counts[order]]  (ALIGN8)
  [ProbingVocabularyHeader][vocab hash table: (u64 murmur, u32 id)]
  [unigram: (f32 prob, f32 backoff) x (counts[0]+1)]
  [order-n hash table, n=2..order-1: (u64 key, f32 prob, f32 backoff)]
  [order-N hash table: (u64 key, f32 prob)]
  [optional NUL-separated vocab strings, id order]

Word keys are MurmurHash64A(word, seed=0); n-gram keys chain
``CombineWordHash`` from the LAST word id backwards (kenlm
lm/search_hashed.hh). Hash tables are linear-probing with
``start = key % buckets`` and key 0 = empty bucket.

Because n-gram keys are one-way hashes, binary -> ARPA conversion is
impossible; scoring runs directly against the tables. ``logp`` matches
kenlm query semantics (log10 storage, OOV -> <unk> id 0, backoff
accumulation over shortened contexts) and returns natural log like
``ArpaLM.logp``.

Caveats (documented, guarded):
- Only PROBING (model_type 0). TRIE/quantized/REST variants raise with
  the ARPA-conversion recipe.
- Models built from *pruned* ARPA files (where a stored n-gram's
  context is itself absent) can contain kenlm-internal "blank" entries;
  scores on those contexts may differ at the blank. Standard
  lmplz/a8t-train-ngram output has no such holes.
- kenlm is not installable in this environment, so real-kenlm-built
  files cannot be differential-tested here; the format is validated by
  writer<->reader roundtrip plus strict structural checks (sanity
  reference values, section-size consistency) that make a layout
  mismatch fail loudly rather than mis-score (docs/PARITY.md).
"""
from __future__ import annotations

import math
import struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

LOG10 = math.log(10.0)

MAGIC = b"mmap lm http://kheafield.com/code format version 5\n\x00"
# char magic[ALIGN8(sizeof(kMagicBytes))]: sizeof counts C's implicit
# trailing NUL (53), aligned up to 56 zero-padded bytes on disk.
_MAGIC_FIELD = MAGIC.ljust((len(MAGIC) + 1 + 7) // 8 * 8, b"\x00")
_SANITY = struct.Struct("<" + str(len(_MAGIC_FIELD)) + "s fff II 4x Q")
_FIXED = struct.Struct("<B 3x f i ? 3x I")  # order, multiplier, type, vocab?, search_version

MODEL_PROBING = 0
_MODEL_NAMES = {0: "PROBING", 1: "REST_PROBING", 2: "TRIE", 3: "QUANT_TRIE",
                4: "ARRAY_TRIE", 5: "QUANT_ARRAY_TRIE"}

_VOCAB_ENTRY = np.dtype([("key", "<u8"), ("val", "<u4")])          # pack(4): 12 B
_MIDDLE_ENTRY = np.dtype([("key", "<u8"), ("prob", "<f4"), ("backoff", "<f4")])
_LONGEST_ENTRY = np.dtype([("key", "<u8"), ("prob", "<f4")])       # pack(4): 12 B

_M64 = (1 << 64) - 1
_COMBINE_A = 8978948897894561157
_COMBINE_B = 17894857484156487943


def _align8(n: int) -> int:
    return (n + 7) // 8 * 8


def murmur_hash64a(data: bytes, seed: int = 0) -> int:
    """MurmurHash64A (Appleby), kenlm's portable word hash
    (util/murmur_hash.cc, seed 0 via lm/vocab HashForVocab)."""
    m = 0xC6A4A7935BD1E995
    r = 47
    h = (seed ^ ((len(data) * m) & _M64)) & _M64
    n8 = len(data) // 8 * 8
    for i in range(0, n8, 8):
        k = int.from_bytes(data[i:i + 8], "little")
        k = (k * m) & _M64
        k ^= k >> r
        k = (k * m) & _M64
        h = ((h ^ k) * m) & _M64
    tail = data[n8:]
    if tail:
        h ^= int.from_bytes(tail, "little")
        h = (h * m) & _M64
    h ^= h >> r
    h = (h * m) & _M64
    h ^= h >> r
    return h


def combine_word_hash(current: int, next_word: int) -> int:
    """kenlm lm/search_hashed.hh CombineWordHash: extend an n-gram key
    by one more-distant context word id."""
    return ((current * _COMBINE_A) ^ (((1 + next_word) * _COMBINE_B) & _M64)) & _M64


def ngram_key(ids: Sequence[int]) -> int:
    """Hash key of an n-gram (oldest..newest word ids), n >= 2: start
    from the newest word's id and chain backwards through the context,
    mirroring kenlm's scoring walk (lm/model.cc ScoreExceptBackoff)."""
    key = ids[-1]
    for w in reversed(ids[:-1]):
        key = combine_word_hash(key, w)
    return key


def _buckets(entries: int, multiplier: float) -> int:
    """util/probing_hash_table.hh Size(): bucket count replicates the
    float32 arithmetic so reader/writer agree with kenlm bit-for-bit."""
    return max(entries + 1,
               int(np.float32(multiplier) * np.float32(entries)))


def _probe_insert(keys: np.ndarray, key: int, store) -> None:
    n = len(keys)
    i = key % n
    while keys[i] != 0:
        i = (i + 1) % n
    store(i)


class KenLMBinaryLM:
    """Scorer over a KenLM PROBING binary model file.

    Drop-in for ``ArpaLM`` in beam fusion: ``logp(word, context)`` in
    natural log. The file is memory-mapped; per-word id lookups are
    memoized so repeated beam queries stay cheap.
    """

    def __init__(self, path: str):
        self.path = path
        buf = np.memmap(path, dtype=np.uint8, mode="r")
        raw = memoryview(buf)
        if len(raw) < _SANITY.size or bytes(raw[:len(MAGIC)]) != MAGIC:
            head = bytes(raw[:len(MAGIC)])
            if head == MAGIC[:len(head)]:  # v5 magic, file just ends
                raise ValueError(
                    f"{path}: KenLM binary truncated ({len(raw)} bytes "
                    "is smaller than the fixed header); " + _CONVERT_HINT)
            if head.startswith(b"mmap lm"):
                raise ValueError(
                    f"{path}: KenLM binary with unsupported format "
                    "version (only 'format version 5' is supported); "
                    + _CONVERT_HINT)
            raise ValueError(f"{path} is not a KenLM binary model")
        size = len(raw)
        # a truncated header must raise the same actionable ValueError as
        # every other structural problem, not struct.error/OverflowError
        if size < _SANITY.size + _FIXED.size + 8:
            raise ValueError(
                f"{path}: KenLM binary truncated ({size} bytes is smaller "
                "than the fixed header); " + _CONVERT_HINT)
        try:
            magic, zero_f, one_f, minus_half_f, one_w, max_w, one_u64 = \
                _SANITY.unpack_from(raw, 0)
            if (zero_f, one_f, minus_half_f, one_w, max_w, one_u64) != \
                    (0.0, 1.0, -0.5, 1, 0xFFFFFFFF, 1):
                raise ValueError(
                    f"{path}: KenLM sanity header mismatch (file written on "
                    "an incompatible platform or layout drift); " + _CONVERT_HINT)
            order, multiplier, model_type, has_vocab, search_version = \
                _FIXED.unpack_from(raw, _SANITY.size)
            if model_type != MODEL_PROBING:
                name = _MODEL_NAMES.get(model_type, str(model_type))
                raise ValueError(
                    f"{path}: KenLM binary search type {name} is not "
                    "supported (PROBING only, i.e. build_binary's default "
                    "without the 'trie' argument); " + _CONVERT_HINT)
            if order < 1:
                raise ValueError(f"{path}: invalid order {order}")
            if not (1.0 < multiplier < 1e6):
                raise ValueError(
                    f"{path}: implausible probing multiplier {multiplier}; "
                    + _CONVERT_HINT)
            counts_off = _SANITY.size + _FIXED.size
            counts = struct.unpack_from("<" + "Q" * order, raw, counts_off)
        except (struct.error, OverflowError) as e:
            raise ValueError(
                f"{path}: KenLM binary truncated or corrupt header "
                f"({e}); " + _CONVERT_HINT) from e
        # every stored n-gram occupies >= 8 bytes: counts beyond size/8
        # are corrupt and would otherwise blow up the bucket arithmetic
        for i, c in enumerate(counts):
            if c == 0 or c > size // 8:
                raise ValueError(
                    f"{path}: implausible {i + 1}-gram count {c} for a "
                    f"{size}-byte file; " + _CONVERT_HINT)
        self.order = order
        self.counts = list(counts)
        off = _align8(counts_off + 8 * order)

        def need(bytes_, what):
            if off + bytes_ > size:
                raise ValueError(
                    f"{path}: {what} section ({bytes_} bytes at offset "
                    f"{off}) runs past end of file ({size} bytes); "
                    + _CONVERT_HINT)

        # --- vocabulary: u64 header (bound) + probing table ---
        (self.bound,) = struct.unpack_from("<Q", raw, off)
        off += 8
        if self.bound > counts[0] + 1:
            raise ValueError(
                f"{path}: vocab bound {self.bound} exceeds unigram count "
                f"{counts[0]}; " + _CONVERT_HINT)
        vb = _buckets(counts[0], multiplier)
        need(vb * _VOCAB_ENTRY.itemsize, "vocab hash")
        self._vocab = np.frombuffer(raw, dtype=_VOCAB_ENTRY, count=vb,
                                    offset=off)
        off += vb * _VOCAB_ENTRY.itemsize

        # --- unigram: (counts[0]+1) ProbBackoff, indexed by word id ---
        need(8 * (counts[0] + 1), "unigram")
        self._unigram = np.frombuffer(
            raw, dtype="<f4", count=2 * (counts[0] + 1),
            offset=off).reshape(-1, 2)
        off += 8 * (counts[0] + 1)

        # --- middle tables (orders 2..order-1) and longest (order) ---
        self._middles: List[np.ndarray] = []
        for n in range(2, order):
            mb = _buckets(counts[n - 1], multiplier)
            need(mb * _MIDDLE_ENTRY.itemsize, f"{n}-gram hash")
            self._middles.append(np.frombuffer(
                raw, dtype=_MIDDLE_ENTRY, count=mb, offset=off))
            off += mb * _MIDDLE_ENTRY.itemsize
        self._longest: Optional[np.ndarray] = None
        if order > 1:
            lb = _buckets(counts[order - 1], multiplier)
            need(lb * _LONGEST_ENTRY.itemsize, f"{order}-gram hash")
            self._longest = np.frombuffer(
                raw, dtype=_LONGEST_ENTRY, count=lb, offset=off)
            off += lb * _LONGEST_ENTRY.itemsize

        if not has_vocab and off != size:
            raise ValueError(
                f"{path}: section layout inconsistent with file size "
                f"(expected body end {off}, file is {size} bytes) — "
                "refusing to mis-score; " + _CONVERT_HINT)
        self.words: Optional[List[str]] = None
        if has_vocab and off < size:
            # the trailing string section must hold exactly the `bound`
            # NUL-terminated words: a shortfall in the table layout would
            # otherwise be silently absorbed as garbage "vocab strings"
            tail = bytes(raw[off:])
            words = tail.split(b"\x00")
            if words and words[-1] == b"":
                words.pop()
            if len(words) != self.bound:
                raise ValueError(
                    f"{path}: vocab string section holds {len(words)} "
                    f"words, expected {self.bound} — section layout "
                    "inconsistent, refusing to mis-score; " + _CONVERT_HINT)
            self.words = [w.decode("utf-8", "replace") for w in words]
        self._id_cache: Dict[str, int] = {"<unk>": 0, "<UNK>": 0}
        if self.words is not None and self.bound > 1:
            # spot-check: the strings round-trip through the hash table
            for wid in {1, self.bound // 2, self.bound - 1}:
                if wid >= 1 and self.index(self.words[wid]) != wid:
                    raise ValueError(
                        f"{path}: vocab string {self.words[wid]!r} does "
                        f"not hash back to id {wid} — section layout "
                        "inconsistent, refusing to mis-score; "
                        + _CONVERT_HINT)

    # -- lookups ---------------------------------------------------------
    def index(self, word: str) -> int:
        """Word id via the murmur probing table; OOV -> 0 (<unk>)."""
        wid = self._id_cache.get(word)
        if wid is not None:
            return wid
        key = murmur_hash64a(word.encode("utf-8"))
        tab = self._vocab
        n = len(tab)
        i = key % n
        wid = 0
        while True:
            k = int(tab["key"][i])
            if k == key:
                wid = int(tab["val"][i])
                if wid >= len(self._unigram):  # corrupt table: treat as OOV
                    wid = 0
                break
            if k == 0:
                break
            i = (i + 1) % n
        self._id_cache[word] = wid
        return wid

    def _find(self, ids: Tuple[int, ...]):
        """(prob10, backoff10) of the exact n-gram, or None."""
        n = len(ids)
        if n == 1:
            # every id < bound has a unigram row; ids only come from
            # index(), so presence is structural
            p, b = self._unigram[ids[0]]
            return float(p), float(b)
        key = ngram_key(ids)
        if key == 0:  # degenerate: collides with the empty-bucket marker
            return None
        tab = self._longest if n == self.order else self._middles[n - 2]
        nb = len(tab)
        i = key % nb
        while True:
            k = int(tab["key"][i])
            if k == key:
                if n == self.order:
                    return float(tab["prob"][i]), 0.0
                return float(tab["prob"][i]), float(tab["backoff"][i])
            if k == 0:
                return None
            i = (i + 1) % nb

    def logp(self, word: str, context: Tuple[str, ...]) -> float:
        """ln P(word | context), kenlm backoff semantics: longest match
        wins, each missed context level adds that context's backoff.
        OOV words (target or context) map to <unk> (id 0)."""
        wid = self.index(word)
        ctx = tuple(self.index(w) for w in context[-(self.order - 1):]) \
            if self.order > 1 else ()
        acc = 0.0
        while True:
            hit = self._find(ctx + (wid,))
            if hit is not None:
                return (acc + hit[0]) * LOG10
            if not ctx:  # unigram always resolves (id 0 row exists)
                p, _ = self._unigram[wid]
                return (acc + float(p)) * LOG10
            bo = self._find(ctx)
            if bo is not None:
                acc += bo[1]
            ctx = ctx[1:]

    def score_sequence(self, words: Sequence[str]) -> float:
        total, ctx = 0.0, ()
        for w in words:
            total += self.logp(w, ctx)
            ctx = ctx + (w,)
        return total


_CONVERT_HINT = (
    "use the original ARPA text (it loads directly, .gz accepted), "
    "rebuild the binary as PROBING — on any machine with kenlm: "
    "`build_binary lm.arpa lm.bin` (no 'trie' argument), or from ARPA "
    "in-package: `a8t-build-binary lm.arpa lm.bin` — or re-estimate: "
    "`a8t-train-ngram --input corpus.txt --output lm.arpa --order <n>`. "
    "TRIE/quantized subtypes are deliberately not parsed in-process: "
    "their bit-packed layout cannot be validated without real kenlm "
    "artifacts, and a guessed parse risks silent mis-scoring "
    "(docs/PARITY.md 'KenLM binary models')")


def write_kenlm_binary(arpa_path: str, out_path: str,
                       probing_multiplier: float = 1.5,
                       write_vocab_strings: bool = True) -> Dict[str, int]:
    """Build a KenLM PROBING binary from an ARPA file (kenlm
    ``build_binary`` equivalent; the reference's LM prep step). Returns
    the per-order n-gram counts written.

    Word ids: <unk> (or <UNK>) is id 0 and is NOT inserted into the
    vocab hash table (kenlm lm/vocab.cc Insert); other unigrams get
    1, 2, ... in ARPA order. An ARPA without <unk> gets a synthesized
    id-0 row with prob -100 (kenlm's OOV floor).
    """
    from audio8_tpu.ops.lm import ArpaLM

    lm = ArpaLM(arpa_path)
    order = max(1, lm.order)
    by_order: List[List[Tuple[Tuple[str, ...], float, float]]] = \
        [[] for _ in range(order)]
    for gram, (p_ln, b_ln) in lm.ngrams.items():
        by_order[len(gram) - 1].append((gram, p_ln / LOG10, b_ln / LOG10))

    word_ids: Dict[str, int] = {}
    unk_row = (-100.0, 0.0)
    next_id = 1
    uni_rows: Dict[int, Tuple[float, float]] = {}
    for (w,), p10, b10 in by_order[0]:
        if w in ("<unk>", "<UNK>"):
            unk_row = (p10, b10)
            continue
        word_ids[w] = next_id
        uni_rows[next_id] = (p10, b10)
        next_id += 1
    bound = next_id
    counts = [len(g) for g in by_order]

    # --- vocab table ---
    vb = _buckets(counts[0], probing_multiplier)
    vocab = np.zeros(vb, dtype=_VOCAB_ENTRY)
    for w, wid in word_ids.items():
        key = murmur_hash64a(w.encode("utf-8"))
        if key == 0:
            raise ValueError(f"word {w!r} murmur-hashes to the reserved "
                             "empty-bucket key 0")
        def put(i, key=key, wid=wid):
            vocab["key"][i] = key
            vocab["val"][i] = wid
        _probe_insert(vocab["key"], key, put)

    # --- unigram array ---
    unigram = np.zeros((counts[0] + 1, 2), dtype="<f4")
    unigram[0] = unk_row
    for wid, row in uni_rows.items():
        unigram[wid] = row

    def ids_of(gram: Tuple[str, ...]) -> Tuple[int, ...]:
        return tuple(word_ids.get(w, 0) for w in gram)

    def checked_key(gram: Tuple[str, ...]) -> int:
        key = ngram_key(ids_of(gram))
        if key == 0:
            # astronomically rare, but a key-0 entry is indistinguishable
            # from an empty bucket: unreadable, and later probe inserts
            # could overwrite it. Refuse rather than emit a table that
            # silently drops/mis-scores this n-gram.
            raise ValueError(
                f"n-gram {gram!r} hash-chains to the reserved "
                "empty-bucket key 0; cannot be stored in a PROBING "
                "binary — drop it from the ARPA or use the ARPA directly")
        return key

    # --- middle tables ---
    middles = []
    for n in range(2, order):
        mb = _buckets(counts[n - 1], probing_multiplier)
        tab = np.zeros(mb, dtype=_MIDDLE_ENTRY)
        for gram, p10, b10 in by_order[n - 1]:
            key = checked_key(gram)
            def put(i, key=key, p10=p10, b10=b10, tab=tab):
                tab["key"][i] = key
                tab["prob"][i] = p10
                tab["backoff"][i] = b10
            _probe_insert(tab["key"], key, put)
        middles.append(tab)

    # --- longest table ---
    longest = None
    if order > 1:
        lb = _buckets(counts[order - 1], probing_multiplier)
        longest = np.zeros(lb, dtype=_LONGEST_ENTRY)
        for gram, p10, _ in by_order[order - 1]:
            key = checked_key(gram)
            def put(i, key=key, p10=p10):
                longest["key"][i] = key
                longest["prob"][i] = p10
            _probe_insert(longest["key"], key, put)

    # --- header ---
    sanity = _SANITY.pack(_MAGIC_FIELD, 0.0, 1.0, -0.5, 1, 0xFFFFFFFF, 1)
    fixed = _FIXED.pack(order, np.float32(probing_multiplier),
                        MODEL_PROBING, bool(write_vocab_strings), 0)
    counts_blob = struct.pack("<" + "Q" * order, *counts)
    header = sanity + fixed + counts_blob
    header += b"\x00" * (_align8(len(header)) - len(header))

    with open(out_path, "wb") as f:
        f.write(header)
        f.write(struct.pack("<Q", bound))
        f.write(vocab.tobytes())
        f.write(unigram.tobytes())
        for tab in middles:
            f.write(tab.tobytes())
        if longest is not None:
            f.write(longest.tobytes())
        if write_vocab_strings:
            names = ["<unk>"] + [""] * (bound - 1)
            for w, wid in word_ids.items():
                names[wid] = w
            f.write(b"".join(w.encode("utf-8") + b"\x00" for w in names))
    return {"order": order, "counts": counts, "bound": bound}
