"""KenLM *binary* language models: PROBING + TRIE readers, and writers.

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

and for the TRIE / QUANT_TRIE search types (``build_binary trie [-q]``,
kenlm lm/search_trie.cc, lm/trie.hh, lm/quantize.hh):

  [Sanity header][FixedWidthParameters][uint64 counts[order]]  (ALIGN8)
  [SortedVocabulary: u64 n, then counts[0] u64 slots of sorted hashes]
  [quant tables, QUANT_TRIE only: u8 prob_bits, u8 backoff_bits, 6 pad,
   per middle order a f32[2^pb] prob + f32[2^bb] backoff table,
   then the longest order's f32[2^pb] prob table]
  [unigram: (f32 prob, f32 backoff, u64 next) x (counts[0]+2)]
  [bit-packed middle array per order 2..N-1:
   word | prob | backoff | next-index, (counts[n-1]+1) entries]
  [bit-packed longest array: word | prob, (counts[N-1]+1) entries]
  [optional NUL-separated vocab strings, id order]

Word keys are MurmurHash64A(word, seed=0). PROBING n-gram keys chain
``CombineWordHash`` from the LAST word id backwards (kenlm
lm/search_hashed.hh); its hash tables are linear-probing with
``start = key % buckets`` and key 0 = empty bucket. The TRIE stores
reversed n-grams — the root branches on the PREDICTED word, then the
context from most recent to oldest (lm/model.cc ScoreExceptBackoff
walks exactly that order) — as sorted bit-packed per-order arrays:
each node's children occupy ``[next(entry), next(entry+1))`` in the
next order's array, word-sorted for binary search. Probs are stored
sign-stripped in 31 bits (util/bit_packing.hh WriteNonPositiveFloat31),
backoffs as full f32, or both as table indices when quantized
(lm/quantize.hh SeparatelyQuantize: per-(order,field) f32 center
tables, index bit-widths from the header byte pair).

For PROBING, n-gram keys are one-way hashes, so binary -> ARPA
conversion is impossible; scoring runs directly against the tables.
``logp`` matches kenlm query semantics (log10 storage, OOV -> <unk>
id 0, backoff accumulation over shortened contexts) and returns
natural log like ``ArpaLM.logp``.

Caveats (documented, guarded):
- PROBING (0), TRIE (2) and QUANT_TRIE (3) load. REST_PROBING (1) and
  the Bhiksha-compressed ARRAY_TRIE variants (4, 5; ``build_binary -a``)
  raise with the ARPA-conversion recipe.
- kenlm's published layout is mirrored structurally, but real-kenlm
  artifacts cannot be differential-tested in this environment (see
  below); every section boundary is therefore cross-checked against
  the file size and the loader refuses (never guesses) on mismatch.
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

import bisect
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
MODEL_TRIE = 2
MODEL_QUANT_TRIE = 3
_MODEL_NAMES = {0: "PROBING", 1: "REST_PROBING", 2: "TRIE", 3: "QUANT_TRIE",
                4: "ARRAY_TRIE", 5: "QUANT_ARRAY_TRIE"}
_SUPPORTED_TYPES = (MODEL_PROBING, MODEL_TRIE, MODEL_QUANT_TRIE)
# lm/search_hashed.hh HashedSearch::kVersion / lm/search_trie.hh
# TrieSearch::kVersion: bumped by kenlm on layout changes, so a
# mismatch means a layout this reader does not know.
_SEARCH_VERSION = {MODEL_PROBING: 0, MODEL_TRIE: 1, MODEL_QUANT_TRIE: 1}
_SIGN_BIT = 0x80000000

_VOCAB_ENTRY = np.dtype([("key", "<u8"), ("val", "<u4")])          # pack(4): 12 B
_MIDDLE_ENTRY = np.dtype([("key", "<u8"), ("prob", "<f4"), ("backoff", "<f4")])
_LONGEST_ENTRY = np.dtype([("key", "<u8"), ("prob", "<f4")])       # pack(4): 12 B

_M64 = (1 << 64) - 1
_COMBINE_A = 8978948897894561157
_COMBINE_B = 17894857484156487943


def _align8(n: int) -> int:
    return (n + 7) // 8 * 8


def _required_bits(max_value: int) -> int:
    """util/bit_packing.hh RequiredBits: bits to hold ``max_value``."""
    return max_value.bit_length()


def _read_bits(buf, bit_off: int, nbits: int) -> int:
    """Little-endian field read at an arbitrary bit offset (the
    util/bit_packing.hh ReadInt57 semantics: shift within the 64-bit
    window at byte ``bit_off >> 3`` by ``bit_off & 7``)."""
    byte = bit_off >> 3
    window = int.from_bytes(bytes(buf[byte:byte + 8]), "little")
    return (window >> (bit_off & 7)) & ((1 << nbits) - 1)


def _read_bits_vec(buf, bit_offs: np.ndarray, nbits: int) -> np.ndarray:
    """Vectorized ``_read_bits`` over a uint64 array of bit offsets
    (load-time structural validation reads every entry's field once)."""
    data = np.frombuffer(buf, dtype=np.uint8)
    byte = (bit_offs >> 3).astype(np.int64)
    window = np.zeros(len(bit_offs), dtype=np.uint64)
    for k in range((nbits + 14) // 8):  # covers shift (<8) + nbits
        window |= data[byte + k].astype(np.uint64) << np.uint64(8 * k)
    shift = (bit_offs & np.uint64(7)).astype(np.uint64)
    return (window >> shift) & np.uint64((1 << nbits) - 1)


def _write_bits(buf: bytearray, bit_off: int, nbits: int, value: int) -> None:
    byte = bit_off >> 3
    shift = bit_off & 7
    span = (shift + nbits + 7) // 8
    cur = int.from_bytes(buf[byte:byte + span], "little")
    mask = ((1 << nbits) - 1) << shift
    cur = (cur & ~mask) | ((value << shift) & mask)
    buf[byte:byte + span] = cur.to_bytes(span, "little")


def _f32_from_bits(u: int) -> float:
    return struct.unpack("<f", struct.pack("<I", u & 0xFFFFFFFF))[0]


def _bits_from_f32(v: float) -> int:
    return struct.unpack("<I", struct.pack("<f", v))[0]


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
    """Scorer over a KenLM binary model file — PROBING, TRIE, or
    quantized TRIE (``build_binary``, ``build_binary trie [-q]``).

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
            if model_type not in _SUPPORTED_TYPES:
                name = _MODEL_NAMES.get(model_type, str(model_type))
                raise ValueError(
                    f"{path}: KenLM binary search type {name} is not "
                    "supported (PROBING, TRIE and QUANT_TRIE load; "
                    "REST_PROBING and the -a array variants do not); "
                    + _CONVERT_HINT)
            if search_version != _SEARCH_VERSION[model_type]:
                raise ValueError(
                    f"{path}: KenLM {_MODEL_NAMES[model_type]} search "
                    f"layout version {search_version} (this reader knows "
                    f"version {_SEARCH_VERSION[model_type]}) — refusing "
                    "to guess at a drifted layout; " + _CONVERT_HINT)
            if order < 1 or (model_type != MODEL_PROBING and order < 2):
                raise ValueError(f"{path}: invalid order {order} for "
                                 f"{_MODEL_NAMES[model_type]}")
            if model_type == MODEL_PROBING and not (1.0 < multiplier < 1e6):
                raise ValueError(
                    f"{path}: implausible probing multiplier {multiplier}; "
                    + _CONVERT_HINT)
            counts_off = _SANITY.size + _FIXED.size
            counts = struct.unpack_from("<" + "Q" * order, raw, counts_off)
        except (struct.error, OverflowError) as e:
            raise ValueError(
                f"{path}: KenLM binary truncated or corrupt header "
                f"({e}); " + _CONVERT_HINT) from e
        # sanity ceiling before any section arithmetic: a PROBING entry
        # occupies >= 8 bytes; a (quantized) trie entry can be as small
        # as ~2 bits, so allow up to 4 entries/byte there. The exact
        # per-section size checks below do the real validation — this
        # only blocks counts big enough to wrap the math.
        per_byte_limit = size // 8 if model_type == MODEL_PROBING \
            else size * 4
        for i, c in enumerate(counts):
            if c == 0 or c > per_byte_limit:
                raise ValueError(
                    f"{path}: implausible {i + 1}-gram count {c} for a "
                    f"{size}-byte file; " + _CONVERT_HINT)
        self.order = order
        self.counts = list(counts)
        self.model_type = model_type
        off = _align8(counts_off + 8 * order)

        if model_type == MODEL_PROBING:
            off = self._parse_probing(path, raw, off, size, counts,
                                      multiplier)
        else:
            off = self._parse_trie(path, raw, off, size, counts,
                                   model_type == MODEL_QUANT_TRIE)

        if not has_vocab and off != size:
            raise ValueError(
                f"{path}: section layout inconsistent with file size "
                f"(expected body end {off}, file is {size} bytes) — "
                "refusing to mis-score; " + _CONVERT_HINT)
        self.words: Optional[List[str]] = None
        raw_words: Optional[List[bytes]] = None
        if has_vocab and off < size:
            # the trailing string section must hold exactly the `bound`
            # NUL-terminated words: a shortfall in the table layout would
            # otherwise be silently absorbed as garbage "vocab strings".
            # Trailing zero padding after the last terminator is fine
            # (and the C++ loader accepts it), so strip ALL trailing
            # empties, not just one.
            tail = bytes(raw[off:])
            words = tail.split(b"\x00")
            while words and words[-1] == b"":
                words.pop()
            if len(words) != self.bound:
                raise ValueError(
                    f"{path}: vocab string section holds {len(words)} "
                    f"words, expected {self.bound} — section layout "
                    "inconsistent, refusing to mis-score; " + _CONVERT_HINT)
            raw_words = words
            self.words = [w.decode("utf-8", "replace") for w in words]
        self._id_cache: Dict[str, int] = {"<unk>": 0, "<UNK>": 0}
        if raw_words is not None and self.bound > 1:
            # spot-check: the strings' RAW bytes round-trip through the
            # id lookup. Hash the bytes directly — going through
            # index() would re-encode a lossily-decoded non-UTF-8 word
            # and falsely reject a valid file (vocab words are byte
            # strings to kenlm, not necessarily UTF-8).
            for wid in {1, self.bound // 2, self.bound - 1}:
                if wid >= 1 and \
                        self._id_of_key(murmur_hash64a(raw_words[wid])) \
                        != wid:
                    raise ValueError(
                        f"{path}: vocab string {self.words[wid]!r} does "
                        f"not hash back to id {wid} — section layout "
                        "inconsistent, refusing to mis-score; "
                        + _CONVERT_HINT)

    # -- section parsing -------------------------------------------------
    def _need(self, path, off, size, bytes_, what):
        if off + bytes_ > size:
            raise ValueError(
                f"{path}: {what} section ({bytes_} bytes at offset "
                f"{off}) runs past end of file ({size} bytes); "
                + _CONVERT_HINT)

    def _parse_probing(self, path, raw, off, size, counts,
                       multiplier) -> int:
        # --- vocabulary: u64 header (bound) + probing table ---
        self._need(path, off, size, 8, "vocab header")
        (self.bound,) = struct.unpack_from("<Q", raw, off)
        off += 8
        if self.bound > counts[0] + 1:
            raise ValueError(
                f"{path}: vocab bound {self.bound} exceeds unigram count "
                f"{counts[0]}; " + _CONVERT_HINT)
        vb = _buckets(counts[0], multiplier)
        self._need(path, off, size, vb * _VOCAB_ENTRY.itemsize,
                   "vocab hash")
        self._vocab = np.frombuffer(raw, dtype=_VOCAB_ENTRY, count=vb,
                                    offset=off)
        off += vb * _VOCAB_ENTRY.itemsize

        # --- unigram: (counts[0]+1) ProbBackoff, indexed by word id ---
        self._need(path, off, size, 8 * (counts[0] + 1), "unigram")
        self._unigram = np.frombuffer(
            raw, dtype="<f4", count=2 * (counts[0] + 1),
            offset=off).reshape(-1, 2)
        off += 8 * (counts[0] + 1)

        # --- middle tables (orders 2..order-1) and longest (order) ---
        self._middles: List[np.ndarray] = []
        for n in range(2, self.order):
            mb = _buckets(counts[n - 1], multiplier)
            self._need(path, off, size, mb * _MIDDLE_ENTRY.itemsize,
                       f"{n}-gram hash")
            self._middles.append(np.frombuffer(
                raw, dtype=_MIDDLE_ENTRY, count=mb, offset=off))
            off += mb * _MIDDLE_ENTRY.itemsize
        self._longest: Optional[np.ndarray] = None
        if self.order > 1:
            lb = _buckets(counts[self.order - 1], multiplier)
            self._need(path, off, size, lb * _LONGEST_ENTRY.itemsize,
                       f"{self.order}-gram hash")
            self._longest = np.frombuffer(
                raw, dtype=_LONGEST_ENTRY, count=lb, offset=off)
            off += lb * _LONGEST_ENTRY.itemsize
        return off

    def _parse_trie(self, path, raw, off, size, counts,
                    quantized: bool) -> int:
        order = self.order
        # --- SortedVocabulary: u64 n (excl. <unk>), counts[0] hash slots
        # (lm/vocab.cc SortedVocabulary::Size leads with the entry count;
        # space is allocated for counts[0] hashes but <unk> is never
        # inserted, so the last slot is zero slack when <unk> is in the
        # ARPA's unigrams) ---
        self._need(path, off, size, 8 + 8 * counts[0], "sorted vocab")
        (n_vocab,) = struct.unpack_from("<Q", raw, off)
        if not (counts[0] - 1 <= n_vocab <= counts[0]):
            raise ValueError(
                f"{path}: sorted-vocab entry count {n_vocab} inconsistent "
                f"with unigram count {counts[0]}; " + _CONVERT_HINT)
        self._vocab_sorted = np.frombuffer(
            raw, dtype="<u8", count=n_vocab, offset=off + 8)
        if n_vocab > 1 and not bool(
                np.all(self._vocab_sorted[:-1] < self._vocab_sorted[1:])):
            raise ValueError(
                f"{path}: sorted-vocab hashes are not strictly "
                "increasing; " + _CONVERT_HINT)
        self.bound = n_vocab + 1
        off += 8 + 8 * counts[0]

        # --- quant tables (QUANT_TRIE): header byte pair + f32 centers
        # (lm/quantize.hh SeparatelyQuantize) ---
        self._quant: Optional[dict] = None
        if quantized:
            self._need(path, off, size, 8, "quant header")
            pb, bb = raw[off], raw[off + 1]
            if not (1 <= pb <= 25 and 1 <= bb <= 25):
                raise ValueError(
                    f"{path}: quantization bits ({pb}, {bb}) outside "
                    "kenlm's 1..25 range; " + _CONVERT_HINT)
            toff = off + 8
            mid_tables = []
            for _ in range(order - 2):
                self._need(path, toff, size, 4 << pb, "quant prob table")
                probs = np.frombuffer(raw, dtype="<f4", count=1 << pb,
                                      offset=toff)
                toff += 4 << pb
                self._need(path, toff, size, 4 << bb,
                           "quant backoff table")
                backs = np.frombuffer(raw, dtype="<f4", count=1 << bb,
                                      offset=toff)
                toff += 4 << bb
                mid_tables.append((probs, backs))
            self._need(path, toff, size, 4 << pb, "quant longest table")
            longest_probs = np.frombuffer(raw, dtype="<f4", count=1 << pb,
                                          offset=toff)
            toff += 4 << pb
            self._quant = {"prob_bits": pb, "backoff_bits": bb,
                           "mid": mid_tables, "longest": longest_probs}
            off = toff

        # --- unigram: (f32 prob, f32 backoff, u64 next) x (counts[0]+2)
        # (lm/trie.hh Unigram::Size: +1 in case <unk> is absent from the
        # ARPA, +1 for the final end pointer) ---
        uni_rows = counts[0] + 2
        self._need(path, off, size, 16 * uni_rows, "trie unigram")
        self._uni_trie = np.frombuffer(
            raw, dtype=np.dtype([("prob", "<f4"), ("backoff", "<f4"),
                                 ("next", "<u8")]),
            count=uni_rows, offset=off)
        off += 16 * uni_rows

        # --- bit-packed middle arrays (orders 2..N-1) and longest ---
        word_bits = _required_bits(counts[0])
        self._tries: List[dict] = []
        for m in range(2, order):
            if quantized:
                pbits = ("q", self._quant["mid"][m - 2][0],
                         self._quant["prob_bits"])
                bbits = ("q", self._quant["mid"][m - 2][1],
                         self._quant["backoff_bits"])
                qwidth = self._quant["prob_bits"] + \
                    self._quant["backoff_bits"]
            else:
                pbits, bbits, qwidth = ("f31",), ("f32",), 63
            next_bits = _required_bits(counts[m])
            total = word_bits + qwidth + next_bits
            nbytes = ((counts[m - 1] + 1) * total + 7) // 8 + 8
            self._need(path, off, size, nbytes, f"{m}-gram trie")
            self._tries.append({
                "sec": raw[off:off + nbytes], "count": counts[m - 1],
                "total": total, "word_bits": word_bits,
                "prob": pbits, "backoff": bbits,
                "prob_off": word_bits,
                "next_off": word_bits + qwidth, "next_bits": next_bits,
            })
            off += nbytes
        if quantized:
            pbits = ("q", self._quant["longest"], self._quant["prob_bits"])
            qwidth = self._quant["prob_bits"]
        else:
            pbits, qwidth = ("f31",), 31
        total = word_bits + qwidth
        nbytes = ((counts[order - 1] + 1) * total + 7) // 8 + 8
        self._need(path, off, size, nbytes, "longest trie")
        self._tries.append({
            "sec": raw[off:off + nbytes], "count": counts[order - 1],
            "total": total, "word_bits": word_bits,
            "prob": pbits, "backoff": None,
            "prob_off": word_bits, "next_off": None, "next_bits": 0,
        })
        off += nbytes
        # --- load-time structural validation of everything the query
        # walk will trust (fail loudly rather than read out of bounds
        # or silently mis-score): every level's child pointers must be
        # nondecreasing and end exactly at the next level's entry
        # count, and within each node's child range the branching words
        # must be strictly ascending (the binary search's invariant) ---
        parent_next = self._uni_trie["next"][:self.bound + 1]\
            .astype(np.uint64)
        if bool(np.any(parent_next[1:] < parent_next[:-1])) or \
                int(parent_next[-1]) != counts[1]:
            raise ValueError(
                f"{path}: unigram child pointers are not a "
                f"nondecreasing partition of the {counts[1]} bigrams; "
                + _CONVERT_HINT)
        for m in range(2, order + 1):
            t = self._tries[m - 2]
            n = t["count"]
            if t["next_bits"]:
                offs = (np.arange(n + 1, dtype=np.uint64)
                        * np.uint64(t["total"]) + np.uint64(t["next_off"]))
                nexts = _read_bits_vec(t["sec"], offs, t["next_bits"])
                if bool(np.any(nexts[1:] < nexts[:-1])) or \
                        int(nexts[-1]) != counts[m]:
                    raise ValueError(
                        f"{path}: {m}-gram child pointers are not a "
                        f"nondecreasing partition of the {counts[m]} "
                        f"{m + 1}-grams; " + _CONVERT_HINT)
            else:
                nexts = None
            words = _read_bits_vec(
                t["sec"], np.arange(n, dtype=np.uint64)
                * np.uint64(t["total"]), t["word_bits"])
            if int(words.max(initial=0)) > counts[0]:
                raise ValueError(
                    f"{path}: {m}-gram word id exceeds the vocabulary; "
                    + _CONVERT_HINT)
            starts = np.zeros(n, dtype=bool)
            b = parent_next[parent_next < n].astype(np.int64)
            starts[b] = True
            if n and bool(np.any((words[1:] <= words[:-1]) & ~starts[1:])):
                raise ValueError(
                    f"{path}: {m}-gram words are not sorted within a "
                    "node's child range — the trie's binary-search "
                    "invariant is broken; " + _CONVERT_HINT)
            parent_next = nexts
        return off

    # -- trie field access -----------------------------------------------
    def _trie_word(self, t: dict, idx: int) -> int:
        return _read_bits(t["sec"], idx * t["total"], t["word_bits"])

    def _trie_next(self, t: dict, idx: int) -> int:
        return _read_bits(t["sec"], idx * t["total"] + t["next_off"],
                          t["next_bits"])

    def _trie_values(self, t: dict, idx: int) -> Tuple[float, float]:
        base = idx * t["total"] + t["prob_off"]
        if t["prob"][0] == "f31":
            p = _f32_from_bits(_read_bits(t["sec"], base, 31) | _SIGN_BIT)
            boff = base + 31
        else:
            _, table, bits = t["prob"]
            p = float(table[_read_bits(t["sec"], base, bits)])
            boff = base + bits
        if t["backoff"] is None:
            return p, 0.0
        if t["backoff"][0] == "f32":
            b = _f32_from_bits(_read_bits(t["sec"], boff, 32))
        else:
            _, table, bits = t["backoff"]
            b = float(table[_read_bits(t["sec"], boff, bits)])
        return p, b

    def _trie_find_word(self, t: dict, begin: int, end: int,
                        word: int) -> Optional[int]:
        """Binary search ``word`` in the word-sorted entry range
        [begin, end) (kenlm uses interpolation search over the same
        sorted layout — identical results)."""
        lo, hi = begin, end
        while lo < hi:
            mid = (lo + hi) // 2
            wv = self._trie_word(t, mid)
            if wv < word:
                lo = mid + 1
            elif wv > word:
                hi = mid
            else:
                return mid
        return None

    def _find_trie(self, ids: Tuple[int, ...]):
        """(prob10, backoff10) of the exact n-gram via the reversed-path
        walk: unigram of the newest word, then context words newest to
        oldest (lm/model.cc ScoreExceptBackoff's traversal order)."""
        n = len(ids)
        row = self._uni_trie[ids[-1]]
        if n == 1:
            return float(row["prob"]), float(row["backoff"])
        begin, end = int(row["next"]), int(self._uni_trie["next"][ids[-1] + 1])
        for depth, word in enumerate(reversed(ids[:-1]), start=2):
            t = self._tries[depth - 2]
            idx = self._trie_find_word(t, begin, end, word)
            if idx is None:
                return None
            if depth == n:
                return self._trie_values(t, idx)
            begin = self._trie_next(t, idx)
            end = self._trie_next(t, idx + 1)
        raise AssertionError("unreachable")

    # -- lookups ---------------------------------------------------------
    def _id_of_key(self, key: int) -> int:
        """Word id of a murmur hash key (probing table, or binary
        search over the trie's sorted hash list); absent -> 0."""
        if self.model_type != MODEL_PROBING:
            pos = int(np.searchsorted(self._vocab_sorted, np.uint64(key)))
            return pos + 1 if (pos < len(self._vocab_sorted) and
                               int(self._vocab_sorted[pos]) == key) else 0
        tab = self._vocab
        n = len(tab)
        i = key % n
        # probe count bounded by the table size: a corrupt table
        # saturated with nonzero non-matching keys resolves as OOV
        # instead of spinning forever (mirrors the native reader)
        for _ in range(n):
            k = int(tab["key"][i])
            if k == key:
                wid = int(tab["val"][i])
                # corrupt table: treat an id past the unigram as OOV
                return wid if wid < len(self._unigram) else 0
            if k == 0:
                return 0
            i = (i + 1) % n
        return 0

    def index(self, word: str) -> int:
        """Word id; OOV -> 0 (<unk>)."""
        wid = self._id_cache.get(word)
        if wid is None:
            wid = self._id_of_key(murmur_hash64a(word.encode("utf-8")))
            self._id_cache[word] = wid
        return wid

    def _find(self, ids: Tuple[int, ...]):
        """(prob10, backoff10) of the exact n-gram, or None."""
        if self.model_type != MODEL_PROBING:
            return self._find_trie(ids)
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
        # bounded probe (see _id_of_key): corrupt saturated table means
        # not-found, never an infinite loop
        for _ in range(nb):
            k = int(tab["key"][i])
            if k == key:
                if n == self.order:
                    return float(tab["prob"][i]), 0.0
                return float(tab["prob"][i]), float(tab["backoff"][i])
            if k == 0:
                return None
            i = (i + 1) % nb
        return None

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
                p, _ = self._find((wid,))
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
    "rebuild the binary as PROBING or TRIE — on any machine with "
    "kenlm: `build_binary lm.arpa lm.bin` or `build_binary trie "
    "lm.arpa lm.bin` (no -a array compression), or from ARPA "
    "in-package: `a8t-build-binary lm.arpa lm.bin [--trie "
    "[--quantize]]` — or re-estimate: `a8t-train-ngram --input "
    "corpus.txt --output lm.arpa --order <n>`. REST_PROBING and the "
    "-a ARRAY_TRIE subtypes are deliberately not parsed in-process: "
    "their layouts cannot be validated without real kenlm artifacts, "
    "and a guessed parse risks silent mis-scoring (docs/PARITY.md "
    "'KenLM binary models')")


def write_kenlm_binary(arpa_path: str, out_path: str,
                       probing_multiplier: float = 1.5,
                       write_vocab_strings: bool = True,
                       search: str = "probing",
                       quantize: bool = False,
                       prob_bits: int = 8,
                       backoff_bits: int = 8) -> Dict[str, int]:
    """Build a KenLM binary from an ARPA file (kenlm ``build_binary``
    equivalent; the reference's LM prep step). ``search`` picks the
    layout: "probing" (default, like build_binary's) or "trie"
    (build_binary's ``trie`` argument); ``quantize`` with trie stores
    probs/backoffs as ``prob_bits``/``backoff_bits``-wide table indices
    (build_binary ``trie -q``). Returns the per-order n-gram counts
    written.

    Word ids: <unk> (or <UNK>) is id 0 and is NOT inserted into the
    vocab table (kenlm lm/vocab.cc Insert); other unigrams get 1, 2,
    ... in ARPA order (probing) or murmur-hash-sorted order (trie,
    lm/vocab.cc SortedVocabulary). An ARPA without <unk> gets a
    synthesized id-0 row with prob -100 (kenlm's OOV floor).
    """
    from audio8_tpu.ops.lm import ArpaLM

    lm = ArpaLM(arpa_path)
    order = max(1, lm.order)
    by_order: List[List[Tuple[Tuple[str, ...], float, float]]] = \
        [[] for _ in range(order)]
    for gram, (p_ln, b_ln) in lm.ngrams.items():
        by_order[len(gram) - 1].append((gram, p_ln / LOG10, b_ln / LOG10))

    if search == "trie":
        return _write_trie(out_path, order, by_order, write_vocab_strings,
                           quantize, prob_bits, backoff_bits)
    if search != "probing":
        raise ValueError(f"unknown search type {search!r} "
                         "(use 'probing' or 'trie')")
    if quantize:
        raise ValueError("quantization applies to the trie layout only "
                         "(kenlm build_binary trie -q); probing stores "
                         "full f32 probs")

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
    return {"order": order, "counts": counts, "bound": bound,
            "model_type": MODEL_PROBING}


def _quant_table(values: Sequence[float], bits: int,
                 reserve_zeros: bool) -> np.ndarray:
    """Quantization center table (lm/quantize.hh SeparatelyQuantize).
    Backoff tables reserve bins 0/1 for -0.0/+0.0 (kenlm's
    no-extension/extension markers, numerically equal). When the
    distinct values fit the capacity the table is exact and
    quantization is lossless; otherwise kenlm's MakeBins scheme:
    equal-count chunks of the sorted values, center = chunk mean."""
    cap = 1 << bits
    reserved = [-0.0, 0.0] if reserve_zeros else []
    vals = sorted({float(np.float32(v)) for v in values
                   if not (reserve_zeros and np.float32(v) == 0.0)})
    avail = cap - len(reserved)
    if avail <= 0 and vals:
        raise ValueError(
            f"{bits}-bit quantization leaves no room beyond the "
            "reserved zero bins; raise backoff_bits")
    if len(vals) <= avail:
        fill = vals[-1] if vals else 0.0
        centers = vals + [fill] * (avail - len(vals))
    else:
        arr = np.sort(np.asarray(
            [float(np.float32(v)) for v in values
             if not (reserve_zeros and np.float32(v) == 0.0)],
            dtype=np.float64))
        chunks = np.array_split(arr, avail)
        centers, last = [], 0.0
        for c in chunks:
            last = float(c.mean()) if len(c) else last
            centers.append(last)
    return np.asarray(reserved + centers, dtype="<f4")


def _quant_encoder(table: np.ndarray):
    """Vectorized nearest-center encoder for one quant table: values ->
    bin indices in one searchsorted pass (the per-entry argmin scan was
    O(2^bits) per n-gram — hours on a real LM at prob_bits=16)."""
    t64 = table.astype(np.float64)
    order = np.argsort(t64, kind="stable")
    sorted_t = t64[order]

    def encode(values) -> np.ndarray:
        v = np.asarray(values, dtype=np.float32).astype(np.float64)
        pos = np.searchsorted(sorted_t, v)
        lo = np.clip(pos - 1, 0, len(sorted_t) - 1)
        hi = np.clip(pos, 0, len(sorted_t) - 1)
        pick = np.where(np.abs(v - sorted_t[lo]) <= np.abs(v - sorted_t[hi]),
                        lo, hi)
        return order[pick]

    return encode


def _write_trie(out_path: str, order: int, by_order, write_vocab_strings,
                quantize: bool, prob_bits: int,
                backoff_bits: int) -> Dict[str, int]:
    """TRIE / QUANT_TRIE body shared by ``write_kenlm_binary``: the
    reversed-n-gram sorted trie of lm/search_trie.cc (layout details in
    the module docstring)."""
    if order < 2:
        raise ValueError("TRIE binaries need order >= 2 (kenlm's trie "
                         "has no longest-only layout); use "
                         "search='probing' for a unigram LM")
    if quantize and not (1 <= prob_bits <= 25 and 2 <= backoff_bits <= 25):
        raise ValueError("quantization bits must be in 1..25 (kenlm's "
                         "range), backoff_bits >= 2 for the reserved "
                         "zero bins")

    # --- sorted vocabulary (lm/vocab.cc SortedVocabulary) ---
    unk_row = (-100.0, 0.0)
    vocab_entries: List[Tuple[int, str, float, float]] = []
    for (w,), p10, b10 in by_order[0]:
        if w in ("<unk>", "<UNK>"):
            unk_row = (p10, b10)
            continue
        vocab_entries.append((murmur_hash64a(w.encode("utf-8")), w,
                              p10, b10))
    vocab_entries.sort()
    for (ha, *_), (hb, wb, *_) in zip(vocab_entries, vocab_entries[1:]):
        if ha == hb:
            raise ValueError(
                f"two vocabulary words murmur-hash identically "
                f"(near {wb!r}); a sorted-hash TRIE vocab cannot "
                "distinguish them — use search='probing'")
    word_ids = {w: i + 1 for i, (_, w, _, _) in enumerate(vocab_entries)}
    n_vocab = len(vocab_entries)
    bound = n_vocab + 1
    counts = [len(g) for g in by_order]

    # --- per-order reversed paths, lexicographically sorted: an
    # n-gram (w1..wn) lives at path (wn, w(n-1), ..., w1) — the root
    # branches on the predicted word, then the context newest-first ---
    levels: List[List[Tuple[Tuple[int, ...], float, float, int]]] = []
    for m in range(2, order + 1):
        entries = []
        for gram, p10, b10 in by_order[m - 1]:
            ids = tuple(word_ids.get(w, 0) for w in gram)
            entries.append((tuple(reversed(ids)), p10, b10, 0))
        entries.sort(key=lambda e: e[0])
        for (pa, *_), (pb, *_) in zip(entries, entries[1:]):
            if pa == pb:
                raise ValueError(
                    f"duplicate {m}-gram after vocab id mapping (an "
                    "n-gram references a word absent from the "
                    "unigrams?); refusing to build a TRIE")
        levels.append(entries)

    # --- parent linkage (entry at level m+1 -> its level-m prefix) ---
    for li in range(1, len(levels)):
        parent_of = {e[0]: i for i, e in enumerate(levels[li - 1])}
        linked = []
        for path, p10, b10, _ in levels[li]:
            pi = parent_of.get(path[:-1])
            if pi is None:
                n = li + 2
                raise ValueError(
                    f"ARPA is not suffix-closed: a {n}-gram's "
                    f"{n - 1}-gram suffix is missing (pruned LM). "
                    "kenlm fills such holes with blank entries; "
                    "re-estimate unpruned (a8t-train-ngram) or use "
                    "search='probing'")
            linked.append((path, p10, b10, pi))
        levels[li] = linked

    # --- quantization tables ---
    quant_blob = b""
    mid_tabs: List[Tuple[np.ndarray, np.ndarray]] = []
    long_tab: Optional[np.ndarray] = None
    if quantize:
        parts = [bytes([prob_bits, backoff_bits]) + b"\x00" * 6]
        for m in range(2, order):
            lv = levels[m - 2]
            pt = _quant_table([e[1] for e in lv], prob_bits, False)
            bt = _quant_table([e[2] for e in lv], backoff_bits, True)
            mid_tabs.append((pt, bt))
            parts.append(pt.tobytes())
            parts.append(bt.tobytes())
        long_tab = _quant_table([e[1] for e in levels[order - 2]],
                                prob_bits, False)
        parts.append(long_tab.tobytes())
        quant_blob = b"".join(parts)

    # --- unigram array: prob/backoff rows + child begin pointers ---
    uni = np.zeros(counts[0] + 2,
                   dtype=np.dtype([("prob", "<f4"), ("backoff", "<f4"),
                                   ("next", "<u8")]))
    uni["prob"][0], uni["backoff"][0] = unk_row
    for _, w, p10, b10 in vocab_entries:
        wid = word_ids[w]
        uni["prob"][wid] = p10
        uni["backoff"][wid] = b10
    parents = [e[0][0] for e in levels[0]]
    for w in range(counts[0] + 2):
        uni["next"][w] = bisect.bisect_left(parents, w)

    # --- bit-packed middle arrays and the longest array ---
    word_bits = _required_bits(counts[0])
    secs: List[bytes] = []
    for m in range(2, order):
        qw = (prob_bits + backoff_bits) if quantize else 63
        next_bits = _required_bits(counts[m])
        total = word_bits + qw + next_bits
        buf = bytearray(((counts[m - 1] + 1) * total + 7) // 8 + 8)
        child_parents = [e[3] for e in levels[m - 1]]
        if quantize:
            pt, bt = mid_tabs[m - 2]
            p_idx = _quant_encoder(pt)([e[1] for e in levels[m - 2]])
            b_idx = _quant_encoder(bt)([e[2] for e in levels[m - 2]])
        for j, (path, p10, b10, _) in enumerate(levels[m - 2]):
            bit = j * total
            _write_bits(buf, bit, word_bits, path[-1])
            if quantize:
                _write_bits(buf, bit + word_bits, prob_bits,
                            int(p_idx[j]))
                _write_bits(buf, bit + word_bits + prob_bits,
                            backoff_bits, int(b_idx[j]))
            else:
                _write_bits(buf, bit + word_bits, 31,
                            _bits_from_f32(p10) & ~_SIGN_BIT)
                _write_bits(buf, bit + word_bits + 31, 32,
                            _bits_from_f32(b10))
            _write_bits(buf, bit + word_bits + qw, next_bits,
                        bisect.bisect_left(child_parents, j))
        # sentinel entry: only its next field is meaningful (the end
        # pointer of the last real entry's child range)
        _write_bits(buf, counts[m - 1] * total + word_bits + qw,
                    next_bits, counts[m])
        secs.append(bytes(buf))
    qw = prob_bits if quantize else 31
    total = word_bits + qw
    buf = bytearray(((counts[order - 1] + 1) * total + 7) // 8 + 8)
    if quantize:
        p_idx = _quant_encoder(long_tab)(
            [e[1] for e in levels[order - 2]])
    for j, (path, p10, _b, _) in enumerate(levels[order - 2]):
        bit = j * total
        _write_bits(buf, bit, word_bits, path[-1])
        if quantize:
            _write_bits(buf, bit + word_bits, prob_bits, int(p_idx[j]))
        else:
            _write_bits(buf, bit + word_bits, 31,
                        _bits_from_f32(p10) & ~_SIGN_BIT)
    secs.append(bytes(buf))

    # --- assemble ---
    model_type = MODEL_QUANT_TRIE if quantize else MODEL_TRIE
    sanity = _SANITY.pack(_MAGIC_FIELD, 0.0, 1.0, -0.5, 1, 0xFFFFFFFF, 1)
    fixed = _FIXED.pack(order, np.float32(1.5), model_type,
                        bool(write_vocab_strings),
                        _SEARCH_VERSION[model_type])
    header = sanity + fixed + struct.pack("<" + "Q" * order, *counts)
    header += b"\x00" * (_align8(len(header)) - len(header))
    with open(out_path, "wb") as f:
        f.write(header)
        f.write(struct.pack("<Q", n_vocab))
        f.write(np.asarray([h for h, *_ in vocab_entries],
                           dtype="<u8").tobytes())
        f.write(b"\x00" * (8 * (counts[0] - n_vocab)))
        f.write(quant_blob)
        f.write(uni.tobytes())
        for sec in secs:
            f.write(sec)
        if write_vocab_strings:
            names = ["<unk>"] + [w for _, w, _, _ in vocab_entries]
            f.write(b"".join(w.encode("utf-8") + b"\x00" for w in names))
    return {"order": order, "counts": counts, "bound": bound,
            "model_type": model_type}
