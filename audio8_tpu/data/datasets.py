"""Host input pipeline: manifests, batching, bucketing, prefetch.

Re-design of /root/reference/audio8/data.py for a jit-compiled consumer:

- every emitted batch has a shape drawn from a SMALL STATIC SET: the audio
  axis pads up to a length grid / multiple, the text axis to a multiple,
  and the batch (sentence) axis snaps to a geometric grid (the reference
  pads to the exact batch max, data.py:283-287, and lets B float freely —
  either would trigger one XLA compile per distinct shape);
- batch composition is computed from manifest metadata alone, identically
  on every process, so multi-host data parallelism can form global arrays:
  each process materializes only its contiguous ROW BLOCK of the global
  batch (``row_shard=True``) and the driver assembles them with
  ``jax.make_array_from_process_local_data``. Rows added by batch-size
  snapping are explicit padding (zero signal, zero lengths) that the
  train steps weight out of the loss;
- the unsupervised pretrain stream min-crops to dense (B, T) blocks with
  the reference's accumulate-until-budget semantics (data.py:409-426) and
  snaps T down to a bucket grid;
- sharding is explicit ``(shard_index, num_shards)`` instead of reading
  torch.distributed state (data.py:152-154);
- the torch DataLoader worker processes are replaced by a thread-pool
  prefetcher (audio decode releases the GIL in scipy/libc).
"""
from __future__ import annotations

import concurrent.futures
import logging
import math
import os
import queue
import random
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from audio8_tpu.config import CONV_FEATURES, lane_aligned_pad
from audio8_tpu.data.audio import (AudioResampleReader,
                                   SoundfileAudioReader, speed_perturb_wav)
from audio8_tpu.utils import Offsets

logger = logging.getLogger(__name__)


def _round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


# Batch-size grid: ratio <= ~1.25 so row padding wastes little compute while
# the jitted step sees a bounded set of B values.
B_GRID = [1, 2, 3, 4, 5, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32, 40, 48, 56,
          64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, 448, 512,
          640, 768, 896, 1024]


def snap_batch_size(b: int, multiple: int = 1,
                    grid: Sequence[int] = B_GRID) -> int:
    """Smallest grid entry >= b that is a multiple of ``multiple``; falls
    back to plain round-up when the grid runs out."""
    target = _round_up(b, max(multiple, 1))
    for g in grid:
        if g >= target and g % max(multiple, 1) == 0:
            return g
    return target


def snap_batch_size_down(b: int, multiple: int = 1,
                         grid: Sequence[int] = B_GRID) -> int:
    """Largest grid entry <= b that is a multiple of ``multiple`` (0 if
    none) — used by the dense pretrain stream, which carries leftover rows
    into the next batch instead of padding."""
    best = 0
    m = max(multiple, 1)
    for g in grid:
        if g <= b and g % m == 0:
            best = g
    return best


def batch_by_size(indices, sizes, max_tokens=None, max_sentences=128) -> List[List[int]]:
    """Token-budget batching over length-ordered indices.

    Composition semantics match the reference (data.py:68-110, itself
    fairseq-derived) for batch parity — own implementation: a batch closes
    when it already holds ``max_sentences``, or when admitting the next
    sample would push ``(num_sentences + 1) * running_max_len`` past
    ``max_tokens``.
    """
    use_tokens = max_tokens is not None and max_tokens > 0
    use_sentences = max_sentences is not None and max_sentences > 0
    batches: List[List[int]] = []
    cur: List[int] = []
    cur_max = 0
    for idx in indices:
        n = sizes[idx]
        if use_tokens and n > max_tokens:
            raise AssertionError(
                f"sentence at index {idx} of size {n} exceeds max_tokens "
                f"limit of {max_tokens}!")
        new_max = max(cur_max, n)
        full = cur and (
            (use_sentences and len(cur) == max_sentences)
            or (use_tokens and (len(cur) + 1) * new_max > max_tokens))
        if full:
            batches.append(cur)
            cur, new_max = [], n
        cur.append(idx)
        cur_max = new_max
    if cur:
        batches.append(cur)
    return batches


def find_fit(v: int, fits: Sequence[int]) -> int:
    """Largest bucket <= v, 0 if none (semantics of data.py:429-436)."""
    best = 0
    for f in fits:
        if f <= v:
            best = max(best, f)
    return best


class AudioTextLetterDataset:
    """Supervised (audio, transcript) batches from a TSV manifest.

    Manifest format matches the reference exactly (data.py:168-207): first
    line is the audio root directory, then ``relative_path\\tnum_samples``
    rows, zipped with a sibling ``.ltr``/``.bpe``/``.wrd`` transcript file.
    Batches are pre-computed from descending-length order with a shuffled
    tie-break.

    Sharding modes:
    - ``row_shard=False`` (default): batches are striped round-robin across
      ``num_shards`` (reference semantics, data.py:212-237);
    - ``row_shard=True`` (mesh data parallelism): every shard iterates the
      SAME globally-identical batch schedule (requires identical ``seed``)
      and materializes only its contiguous row block; the global batch size
      snaps to a grid multiple of ``num_shards * batch_multiple``.

    The emitted dict carries ``num_real`` (global count of non-padding
    rows) and ``row_offset`` (this shard's global row offset) for loss
    weighting and metrics.
    """

    TGT_LETTER = "ltr"
    TGT_BPE = "bpe"
    TGT_WRD = "wrd"
    # HuBERT cluster targets (cli/cluster_targets.py): one int id per
    # encoder frame, padded with -1 (every id 0..K-1 is a real cluster,
    # so Offsets.PAD would collide); ``vec`` may be None
    TGT_KM = "km"

    def __init__(
        self,
        tsv_file: str,
        vec,
        target_tokens_per_batch: int,
        max_src_length: Optional[int] = None,
        shuffle: bool = True,
        max_dst_length: int = 1200,
        tgt_type: str = TGT_LETTER,
        input_sample_rate: int = 16_000,
        target_sample_rate: int = 16_000,
        is_infinite: bool = True,
        shard_index: int = 0,
        num_shards: int = 1,
        max_sentences: int = 128,
        pad_to_multiple: int = 16_000,
        text_pad_multiple: int = 64,
        length_grid: Optional[Sequence[int]] = None,
        batch_multiple: int = 1,
        row_shard: bool = False,
        seed: int = 0,
        read_workers: int = 4,
        lane_align: bool = False,
        speed_perturb: Sequence[float] = (),
        noise_mixer=None,
    ):
        """``length_grid``: optional ascending audio lengths (samples); each
        batch pads UP to the smallest grid entry >= its max length, bounding
        the number of distinct XLA programs to len(grid) (a geometric grid
        of ~10 entries covers LibriSpeech). Overrides ``pad_to_multiple``.

        ``batch_multiple``: the per-shard batch size is always a multiple of
        this (pass the per-process 'data' mesh extent so batches shard
        evenly over devices).

        ``lane_align``: clamp pad targets that would push the conv frame
        count past a 128-lane MXU tile boundary the batch's real max length
        didn't require (config.lane_aligned_pad); never drops audio, only
        trims wasted pad.

        ``speed_perturb``: speed factors (e.g. ``(0.9, 1.0, 1.1)``, the
        Kaldi/fairseq 3-way recipe); each training utterance draws one
        per read and is polyphase-resampled to speed*f (duration /f) —
        standard ASR augmentation with no reference equivalent. Pad
        targets scale by the worst-case stretch so static shapes and
        cross-shard shape agreement are unaffected; transcripts are
        unchanged. Leave empty for validation/eval datasets.

        ``noise_mixer``: an optional ``data/audio.NoiseMixer`` (or any
        ``(wav, rng) -> wav`` length-preserving callable) applied to
        each training utterance after speed perturbation."""
        self.sample_factor = target_sample_rate / input_sample_rate
        self.reader = (
            AudioResampleReader(self.sample_factor)
            if input_sample_rate != target_sample_rate
            else SoundfileAudioReader()
        )
        self.vec = vec
        self.max_src_length = max_src_length
        self.max_dst_length = max_dst_length
        self.tgt_type = tgt_type
        self.shuffle = shuffle
        self.is_infinite = is_infinite
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.max_elems_per_batch = target_tokens_per_batch
        self.max_sentences = max_sentences
        self.pad_to_multiple = pad_to_multiple
        self.text_pad_multiple = text_pad_multiple
        self.length_grid = sorted(length_grid) if length_grid else None
        # lane alignment needs the conv stack's length function; 16/8 kHz
        # stacks are the only ones defined (config.CONV_FEATURES)
        sr_khz = target_sample_rate // 1000
        self.lane_align_features = (
            CONV_FEATURES[sr_khz] if lane_align and sr_khz in CONV_FEATURES
            else None)
        self.batch_multiple = max(batch_multiple, 1)
        self.row_shard = row_shard
        self.speed_perturb = [float(f) for f in speed_perturb]
        if any(f <= 0 for f in self.speed_perturb):
            raise ValueError(f"speed factors must be > 0: {speed_perturb}")
        self.noise_mixer = noise_mixer
        # duration multiplies by 1/f; pads must fit the slowest factor
        self._max_stretch = (max(1.0 / min(self.speed_perturb), 1.0)
                             if self.speed_perturb else 1.0)
        self._rng = random.Random(seed)
        self._np_rng = np.random.default_rng(seed)
        # audio decode releases the GIL (ctypes FLAC / scipy WAV), so a
        # thread pool parallelizes per-batch file reads
        self._pool = (concurrent.futures.ThreadPoolExecutor(read_workers)
                      if read_workers > 1 else None)
        self._read_tsv_file(tsv_file)

    def get_or_unk(self, t: str) -> int:
        if t not in self.vec.vocab:
            logger.debug("Word %s not in vocab", t)
            return Offsets.UNK
        return self.vec.vocab[t]

    def _read_tsv_file(self, tsv_file: str) -> None:
        self.files: List[str] = []
        self.sizes: List[int] = []
        self.tokens: List[np.ndarray] = []
        # extension swap, NOT str.replace: the reference's
        # ``tsv_file.replace("tsv", tgt)`` (data.py:171) rewrites the first
        # "tsv" substring anywhere in the path, so a directory named
        # ``tsv_data/`` breaks it — a deliberate fix (SURVEY.md §7)
        transcription_file = (
            os.path.splitext(tsv_file)[0] + "." + self.tgt_type)
        with open(tsv_file) as f, open(transcription_file) as rf:
            directory = f.readline().strip()
            for audio, transcription in zip(f, rf):
                basename, x_length = audio.split("\t")
                path = os.path.join(directory, basename)
                x_length = int(int(x_length) * self.sample_factor)
                if self.max_src_length and x_length > self.max_src_length:
                    continue
                text = transcription.split()
                if self.tgt_type == self.TGT_KM:
                    tokens = np.array([int(t) for t in text], dtype=np.int32)
                elif self.tgt_type != self.TGT_BPE:
                    tokens = self.vec.run(text)
                else:
                    # pre-tokenized BPE: just map pieces to ids, add specials
                    go = [self.vec.vocab[t] for t in self.vec.emit_begin_tok]
                    end = [self.vec.vocab[t] for t in self.vec.emit_end_tok]
                    tokens = np.array(
                        go + [self.get_or_unk(t) for t in text] + end, dtype=np.int32
                    )
                self.files.append(path)
                self.sizes.append(x_length)
                self.tokens.append(tokens)
        keys = (
            self._np_rng.permutation(len(self.files))
            if self.shuffle
            else np.arange(len(self.files))
        )
        indices = np.lexsort((keys, self.sizes))[::-1]  # desc length, shuffled ties
        self.batches = batch_by_size(
            indices, self.sizes, self.max_elems_per_batch, max_sentences=self.max_sentences
        )

    def _shard_order(self) -> List[int]:
        if self.row_shard:
            # all shards walk the full schedule; sharding happens per-row in
            # read_batch (requires identical seed on every shard)
            return list(range(len(self.batches)))
        order = list(range(self.shard_index, len(self.batches), self.num_shards))
        if not order:
            raise RuntimeError(
                f"No batches for shard {self.shard_index}/{self.num_shards}"
            )
        return order

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for plan in self.batch_plans():
            yield self.materialize(plan)

    def batch_plans(self) -> Iterator[dict]:
        """Cheap, sequential batch plans (indices + shapes + augmentation
        draws; no audio decode). All stream randomness happens here, so
        ``materialize`` calls may run on concurrent threads
        (PrefetchLoader ``num_workers``) without perturbing determinism."""
        order = self._shard_order()
        while True:
            if self.shuffle:
                self._rng.shuffle(order)
            for rd in order:
                yield self._plan_batch(self.batches[rd])
            if not self.is_infinite:
                return

    def _global_rows(self, n_real: int) -> int:
        mult = self.batch_multiple * (self.num_shards if self.row_shard else 1)
        return snap_batch_size(n_real, mult)

    def read_batch(self, batch: Sequence[int]) -> Dict[str, np.ndarray]:
        return self.materialize(self._plan_batch(batch))

    def _plan_batch(self, batch: Sequence[int]) -> dict:
        n_real = len(batch)
        b_global = self._global_rows(n_real)
        # audio/text pads come from manifest metadata so every shard agrees
        # on the global shape without decoding the whole batch (scaled by
        # the worst-case speed-perturb stretch so every draw fits)
        max_audio = int(math.ceil(
            max(self.sizes[idx] for idx in batch) * self._max_stretch))
        if self.length_grid:
            fits = [g for g in self.length_grid if g >= max_audio]
            t_audio = fits[0] if fits else _round_up(max_audio, self.pad_to_multiple)
        else:
            t_audio = _round_up(max_audio, self.pad_to_multiple)
        if self.lane_align_features is not None:
            t_audio = lane_aligned_pad(t_audio, max_audio,
                                       self.lane_align_features)
        max_text = max(min(len(self.tokens[idx]), self.max_dst_length) for idx in batch)
        t_text = _round_up(max_text, self.text_pad_multiple)
        t_text = min(t_text, _round_up(self.max_dst_length, self.text_pad_multiple))

        if self.row_shard:
            b_local = b_global // self.num_shards
            lo = self.shard_index * b_local
        else:
            b_local, lo = b_global, 0
        rows = [batch[r] for r in range(lo, min(lo + b_local, n_real))]

        files = [self.files[idx] for idx in rows]
        # augmentation randomness draws in the (sequential) plan so row
        # order (and therefore the stream under a fixed seed) stays
        # deterministic: factors here, a child Generator per row for the
        # noise mixer
        factors = (self._np_rng.choice(self.speed_perturb, size=len(files))
                   if self.speed_perturb else None)
        noise_rngs = ([np.random.default_rng(s) for s in
                       self._np_rng.integers(0, 2**63, size=len(files))]
                      if self.noise_mixer is not None else None)
        return {"rows": rows, "files": files, "factors": factors,
                "noise_rngs": noise_rngs, "b_local": b_local,
                "t_audio": t_audio, "t_text": t_text, "n_real": n_real,
                "lo": lo}

    def materialize(self, plan: dict) -> Dict[str, np.ndarray]:
        """Heavy half of a batch read (decode + pad); thread-safe given a
        plan from ``_plan_batch`` (the dataset's decode pool is shared and
        the only mutable state touched here)."""
        rows, files = plan["rows"], plan["files"]
        factors, noise_rngs = plan["factors"], plan["noise_rngs"]
        b_local, t_audio, t_text = (plan["b_local"], plan["t_audio"],
                                    plan["t_text"])

        def read(i_pth):
            i, pth = i_pth
            wav = self.reader.read(pth, self.max_src_length or -1).squeeze()
            if factors is not None and factors[i] != 1.0:
                wav = speed_perturb_wav(wav, float(factors[i]))
            if noise_rngs is not None:
                wav = self.noise_mixer(wav, noise_rngs[i])
            return wav

        if self._pool is not None:
            audios = list(self._pool.map(read, enumerate(files)))
        else:
            audios = [read(ip) for ip in enumerate(files)]

        signal = np.zeros((b_local, t_audio), np.float32)
        audio_lengths = np.zeros(b_local, np.int32)
        pad_id = -1 if self.tgt_type == self.TGT_KM else Offsets.PAD
        token_ids = np.full((b_local, t_text), pad_id, np.int32)
        text_lengths = np.zeros(b_local, np.int32)
        for i, idx in enumerate(rows):
            a = audios[i][:t_audio]
            audio_lengths[i] = len(a)
            signal[i, : len(a)] = a
            toks = self.tokens[idx][: self.max_dst_length]
            text_lengths[i] = len(toks)
            token_ids[i, : len(toks)] = toks
        return {
            "signal": signal,
            "signal_lengths": audio_lengths,
            "token_ids": token_ids,
            "token_lengths": text_lengths,
            "files": files,
            "num_real": plan["n_real"],
            "row_offset": plan["lo"],
        }


class AudioFileDataset:
    """Unsupervised pretrain stream: infinite shuffled file order, dense
    min-cropped (B, T) batches with no padding (data.py:307-426).

    Batch composition is computed from manifest lengths alone (identical on
    every shard for a given seed), preserving the reference's
    accumulate-until-budget/min-crop/discard-trigger-sample semantics
    (data.py:409-426); the batch size floors to a grid multiple of
    ``batch_multiple`` (× ``num_shards`` when ``row_shard``) with leftover
    rows carried into the next batch. Sharding is per-batch round-robin by
    default, or per-row-block with ``row_shard=True`` (mesh DP).
    """

    def __init__(
        self,
        manifest: str,
        max_length: int,
        target_tokens_per_batch: int,
        shuffle: bool = True,
        min_length: int = 0,
        input_sample_rate: int = 16_000,
        target_sample_rate: int = 16_000,
        shard_index: int = 0,
        num_shards: int = 1,
        length_grid: Optional[Sequence[int]] = None,
        batch_multiple: int = 1,
        row_shard: bool = False,
        seed: int = 0,
        read_workers: int = 4,
    ):
        self.sample_factor = target_sample_rate / input_sample_rate
        self.reader = (
            AudioResampleReader(self.sample_factor)
            if input_sample_rate != target_sample_rate
            else SoundfileAudioReader()
        )
        self.max_length = max_length
        self.shuffle = shuffle
        self.target_tokens_per_batch = target_tokens_per_batch
        self.shard_index = shard_index
        self.num_shards = num_shards
        # snap dense batch length DOWN to this grid to bound compile count
        self.length_grid = sorted(length_grid) if length_grid else None
        self.batch_multiple = max(batch_multiple, 1)
        self.row_shard = row_shard
        self._rng = random.Random(seed)
        self._pool = (concurrent.futures.ThreadPoolExecutor(read_workers)
                      if read_workers > 1 else None)
        self._read_manifest(manifest, min_length)

    def _read_manifest(self, manifest: str, min_length: int) -> None:
        skipped = 0
        self.files: List[Tuple[str, int]] = []
        with open(manifest) as f:
            directory = f.readline().strip()
            for line in f:
                items = line.strip().split("\t")
                sz = int(int(items[1]) * self.sample_factor)
                if min_length is not None and sz < min_length:
                    skipped += 1
                    continue
                self.files.append((os.path.join(directory, items[0]), sz))
        logger.info("loaded %d, skipped %d samples", len(self.files), skipped)

    def _emit_multiple(self) -> int:
        return self.batch_multiple * (self.num_shards if self.row_shard else 1)

    def _snap(self, length: int) -> int:
        if not self.length_grid:
            return length
        snapped = find_fit(length, self.length_grid)
        return snapped if snapped > 0 else length

    def _index_stream(self) -> Iterator[int]:
        """Infinite file-index stream, reshuffled each epoch (identical on
        every shard for a given seed)."""
        if not self.files:
            raise RuntimeError("empty manifest")
        while True:
            order = list(range(len(self.files)))
            if self.shuffle:
                self._rng.shuffle(order)
            yield from order

    def _compose(self, stream) -> Iterator[Tuple[List[int], int]]:
        """Yield (row file indices, crop length T) from an index stream
        using only manifest lengths. Accumulation carries across epoch
        boundaries (like the reference's infinite sample stream,
        data.py:389-426), so small datasets never starve."""
        emit_mult = self._emit_multiple()
        samples: List[Tuple[int, int]] = []  # (file_idx, predicted_len)
        min_len = self.max_length
        for idx in stream:
            predlen = min(self.files[idx][1], self.max_length)
            if len(samples) * min_len >= self.target_tokens_per_batch:
                b = snap_batch_size_down(len(samples), emit_mult)
                if b > 0:
                    emitted, samples = samples[:b], samples[b:]
                    yield ([i for i, _ in emitted],
                           self._snap(min(p for _, p in emitted)))
                    min_len = min([p for _, p in samples] + [self.max_length])
                    # the triggering sample is discarded when a batch went
                    # out (reference quirk, data.py:417-426); otherwise keep
                    # accumulating until a full emit multiple exists
                    continue
            samples.append((idx, predlen))
            min_len = min(min_len, predlen)

    def __iter__(self):
        for plan in self.batch_plans():
            yield self.materialize(plan)

    def batch_plans(self) -> Iterator[Tuple[List[int], int]]:
        """Cheap, sequential (rows, crop length) plans; the stream RNG
        lives entirely here so ``materialize`` is safe to run on
        concurrent threads (PrefetchLoader ``num_workers``)."""
        for bi, (rows, t) in enumerate(self._compose(self._index_stream())):
            if not self.row_shard and bi % self.num_shards != self.shard_index:
                continue
            yield rows, t

    def materialize(self, plan: Tuple[List[int], int]) -> np.ndarray:
        return self.read_batch(*plan)

    def read_batch(self, rows: Sequence[int], t: int) -> np.ndarray:
        if self.row_shard:
            b_local = len(rows) // self.num_shards
            rows = rows[self.shard_index * b_local:(self.shard_index + 1) * b_local]
        paths = [self.files[i][0] for i in rows]
        read = lambda pth: np.asarray(self.reader.read(pth, self.max_length)).squeeze()
        audios = (list(self._pool.map(read, paths)) if self._pool is not None
                  else [read(p) for p in paths])
        batch = np.zeros((len(rows), t), np.float32)
        for i, a in enumerate(audios):
            a = a[:t]  # manifest length is predicted; crop/zero-pad rounding
            batch[i, : len(a)] = a
        return batch


class BucketingAudioDataset(AudioFileDataset):
    """Assign each file to the largest bucket <= its length; emit batches
    cropped to the bucket length — fully static shapes (data.py:439-480).

    Batches are composed per bucket (fixed rows-per-batch from the token
    budget) and then STRIPED ACROSS SHARDS AT BATCH GRANULARITY, so every
    shard sees every length class and no sample is duplicated (the
    reference stripes batches too, data.py:212-237)."""

    def __init__(self, buckets, manifest, max_length, target_tokens_per_batch,
                 shuffle=True, min_length=0, shard_index=0, num_shards=1,
                 batch_multiple=1, row_shard=False, seed=0, read_workers=4,
                 input_sample_rate=16_000, target_sample_rate=16_000):
        self.bucket_lengths = sorted(buckets)
        super().__init__(
            manifest, max_length, target_tokens_per_batch, shuffle=shuffle,
            min_length=min_length, shard_index=shard_index,
            num_shards=num_shards, batch_multiple=batch_multiple,
            row_shard=row_shard, seed=seed, read_workers=read_workers,
            input_sample_rate=input_sample_rate,
            target_sample_rate=target_sample_rate,
        )

    def _read_manifest(self, manifest: str, _min_length) -> None:
        skipped = 0
        num_samples = 0
        self.files = []
        self.bucket_of: List[int] = []
        with open(manifest) as f:
            directory = f.readline().strip()
            for line in f:
                num_samples += 1
                items = line.strip().split("\t")
                sz = int(int(items[1]) * self.sample_factor)
                bucket = find_fit(sz, self.bucket_lengths)
                if bucket == 0:
                    skipped += 1
                    continue
                self.files.append((os.path.join(directory, items[0]), sz))
                self.bucket_of.append(bucket)
        logger.info("Num samples %d, skipped %d", num_samples, skipped)

    def _rows_per(self, bucket: int) -> int:
        emit_mult = self._emit_multiple()
        return max(
            snap_batch_size_down(
                max(self.target_tokens_per_batch // bucket, 1), emit_mult),
            emit_mult)

    def _compose(self, stream) -> Iterator[Tuple[List[int], int]]:
        """Fixed-size chunks per bucket, emitted as the (shuffled) stream
        fills them — batches naturally interleave length classes and
        per-bucket remainders carry across epochs, so a small bucket fills
        up over several passes instead of starving."""
        pending: Dict[int, List[int]] = {}
        for idx in stream:
            bucket = self.bucket_of[idx]
            lst = pending.setdefault(bucket, [])
            lst.append(idx)
            if len(lst) >= self._rows_per(bucket):
                yield list(lst), bucket
                lst.clear()


class PrefetchLoader:
    """Thread-based background prefetcher replacing torch DataLoader workers
    (the reference forks 4 worker processes, train.py:192).

    With ``num_workers > 1`` and a dataset exposing the
    ``batch_plans()``/``materialize(plan)`` split (all package datasets
    do), plans are drawn sequentially — preserving the stream's RNG
    determinism — and materialized (audio decode + padding) on
    ``num_workers`` threads, with batch ORDER preserved, so the emitted
    stream is identical to ``iter(dataset)`` regardless of worker count.
    Falls back to a single producer thread otherwise."""

    _DONE = object()

    def __init__(self, dataset, num_workers: int = 2, prefetch: int = 4):
        self.dataset = dataset
        # clamp to physical cores: on a 1-core host extra decode threads
        # can starve XLA CPU-collective rendezvous threads (40 s abort)
        # while buying nothing; real TPU hosts keep full parallelism
        self.num_workers = max(1, min(int(num_workers),
                                      os.cpu_count() or 1))
        self.prefetch = max(prefetch, 1)

    def __iter__(self):
        if (self.num_workers > 1
                and hasattr(self.dataset, "batch_plans")
                and hasattr(self.dataset, "materialize")):
            yield from self._parallel_iter()
        else:
            yield from self._single_iter()

    def _parallel_iter(self):
        from collections import deque

        depth = self.num_workers + self.prefetch
        pending: deque = deque()
        pool = concurrent.futures.ThreadPoolExecutor(self.num_workers)
        try:
            for plan in self.dataset.batch_plans():
                pending.append(pool.submit(self.dataset.materialize, plan))
                if len(pending) >= depth:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()
        finally:
            for f in pending:
                f.cancel()
            pool.shutdown(wait=False)

    def _single_iter(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for item in self.dataset:
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            finally:
                try:
                    q.put(self._DONE, timeout=0.5)
                except queue.Full:
                    pass

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is self._DONE:
                    return
                yield item
        finally:
            stop.set()
