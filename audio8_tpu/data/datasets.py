"""Host input pipeline: manifests, batching, bucketing, prefetch.

Re-design of /root/reference/audio8/data.py for a jit-compiled consumer:

- every emitted batch has a shape drawn from a SMALL STATIC SET. Supervised
  batches pad the audio axis up to a multiple of ``pad_to_multiple`` samples
  and the text axis to a multiple of ``text_pad_multiple`` (the reference
  pads to the exact batch max, data.py:283-287, which would trigger one XLA
  compile per distinct length);
- the unsupervised pretrain stream min-crops to dense (B, T) blocks exactly
  like the reference (data.py:409-426) and optionally snaps T down to a
  bucket grid;
- sharding is explicit ``(shard_index, num_shards)`` instead of reading
  torch.distributed state (data.py:152-154) — callers pass
  ``jax.process_index()`` / worker ids;
- the torch DataLoader worker processes are replaced by a thread-pool
  prefetcher (audio decode releases the GIL in scipy/libc).
"""
from __future__ import annotations

import concurrent.futures
import logging
import os
import queue
import random
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from audio8_tpu.data.audio import AudioResampleReader, SoundfileAudioReader
from audio8_tpu.utils import Offsets

logger = logging.getLogger(__name__)


def _round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def _is_batch_full(num_sentences, num_tokens, max_tokens, max_sentences):
    if num_sentences == 0:
        return False
    if max_sentences and max_sentences > 0 and num_sentences == max_sentences:
        return True
    if max_tokens and max_tokens > 0 and num_tokens > max_tokens:
        return True
    return False


def batch_by_size(indices, sizes, max_tokens=None, max_sentences=128) -> List[List[int]]:
    """fairseq-style token-budget batching over length-ordered indices
    (data.py:78-110): a batch closes when (len+1)*max_len exceeds
    max_tokens or the sentence cap is hit."""
    sample_len = 0
    sample_lens: List[int] = []
    batch: List[int] = []
    batches: List[List[int]] = []
    for i in range(len(indices)):
        idx = indices[i]
        num_tokens = sizes[idx]
        sample_lens.append(num_tokens)
        sample_len = max(sample_len, num_tokens)
        assert max_tokens is None or max_tokens <= 0 or sample_len <= max_tokens, (
            f"sentence at index {idx} of size {sample_len} exceeds max_tokens "
            f"limit of {max_tokens}!"
        )
        num_tokens = (len(batch) + 1) * sample_len
        if _is_batch_full(len(batch), num_tokens, max_tokens, max_sentences):
            batch_len = len(batch)
            batches.append(batch[:batch_len])
            batch = batch[batch_len:]
            sample_lens = sample_lens[batch_len:]
            sample_len = max(sample_lens) if sample_lens else 0
        batch.append(idx)
    if batch:
        batches.append(batch)
    return batches


def find_fit(v: int, fits: Sequence[int]) -> int:
    """Largest bucket <= v (data.py:429-436)."""
    truncate_to = 0
    for fit in fits:
        if v // fit:
            truncate_to = fit
        else:
            break
    return truncate_to


class AudioTextLetterDataset:
    """Supervised (audio, transcript) batches from a TSV manifest.

    Manifest format matches the reference exactly (data.py:168-207): first
    line is the audio root directory, then ``relative_path\\tnum_samples``
    rows, zipped with a sibling ``.ltr``/``.bpe``/``.wrd`` transcript file.
    Batches are pre-computed from descending-length order with a shuffled
    tie-break, then sharded round-robin across ``num_shards``.
    """

    TGT_LETTER = "ltr"
    TGT_BPE = "bpe"
    TGT_WRD = "wrd"

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
        seed: int = 0,
        read_workers: int = 4,
    ):
        """``length_grid``: optional ascending audio lengths (samples); each
        batch pads UP to the smallest grid entry >= its max length, bounding
        the number of distinct XLA programs to len(grid) (a geometric grid
        of ~10 entries covers LibriSpeech). Overrides ``pad_to_multiple``."""
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
        transcription_file = tsv_file.replace("tsv", self.tgt_type)
        with open(tsv_file) as f, open(transcription_file) as rf:
            directory = f.readline().strip()
            for audio, transcription in zip(f, rf):
                basename, x_length = audio.split("\t")
                path = os.path.join(directory, basename)
                x_length = int(int(x_length) * self.sample_factor)
                if self.max_src_length and x_length > self.max_src_length:
                    continue
                text = transcription.split()
                if self.tgt_type != self.TGT_BPE:
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
        order = list(range(self.shard_index, len(self.batches), self.num_shards))
        if not order:
            raise RuntimeError(
                f"No batches for shard {self.shard_index}/{self.num_shards}"
            )
        return order

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._shard_order()
        while True:
            if self.shuffle:
                self._rng.shuffle(order)
            for rd in order:
                yield self.read_batch(self.batches[rd])
            if not self.is_infinite:
                return

    def read_batch(self, batch: Sequence[int]) -> Dict[str, np.ndarray]:
        files = [self.files[idx] for idx in batch]
        read = lambda pth: self.reader.read(pth, self.max_src_length or -1).squeeze()
        if self._pool is not None:
            audios = list(self._pool.map(read, files))
        else:
            audios = [read(pth) for pth in files]
        audio_lengths = np.zeros(len(batch), np.int32)
        text_lengths = np.zeros(len(batch), np.int32)
        for i, idx in enumerate(batch):
            audio_lengths[i] = len(audios[i])
            text_lengths[i] = min(len(self.tokens[idx]), self.max_dst_length)
        max_audio = int(audio_lengths.max())
        if self.length_grid:
            fits = [g for g in self.length_grid if g >= max_audio]
            t_audio = fits[0] if fits else _round_up(max_audio, self.pad_to_multiple)
        else:
            t_audio = _round_up(max_audio, self.pad_to_multiple)
        t_text = _round_up(int(text_lengths.max()), self.text_pad_multiple)
        t_text = min(t_text, _round_up(self.max_dst_length, self.text_pad_multiple))
        signal = np.zeros((len(batch), t_audio), np.float32)
        token_ids = np.full((len(batch), t_text), Offsets.PAD, np.int32)
        for i, idx in enumerate(batch):
            signal[i, : audio_lengths[i]] = audios[i]
            toks = self.tokens[idx][: text_lengths[i]]
            token_ids[i, : len(toks)] = toks
        return {
            "signal": signal,
            "signal_lengths": audio_lengths,
            "token_ids": token_ids,
            "token_lengths": text_lengths,
            "files": files,
        }


class AudioFileDataset:
    """Unsupervised pretrain stream: infinite shuffled file order, dense
    min-cropped (B, T) batches with no padding (data.py:307-426)."""

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
        seed: int = 0,
        read_workers: int = 4,
    ):
        self.reader = (
            AudioResampleReader(target_sample_rate / input_sample_rate)
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
        self._rng = random.Random(seed)
        self._pool = (concurrent.futures.ThreadPoolExecutor(read_workers)
                      if read_workers > 1 else None)
        self._lookahead = max(read_workers * 2, 1)
        self._read_manifest(manifest, min_length)

    def _read_manifest(self, manifest: str, min_length: int) -> None:
        skipped = 0
        self.files: List[tuple] = []
        with open(manifest) as f:
            directory = f.readline().strip()
            for line in f:
                items = line.strip().split("\t")
                sz = int(items[1])
                if min_length is not None and sz < min_length:
                    skipped += 1
                    continue
                self.files.append((os.path.join(directory, items[0]), sz))
        logger.info("loaded %d, skipped %d samples", len(self.files), skipped)

    def _shard_order(self) -> List[int]:
        order = list(range(self.shard_index, len(self.files), self.num_shards))
        if not order:
            raise RuntimeError(
                f"No files for shard {self.shard_index}/{self.num_shards}"
            )
        return order

    def _path_stream(self):
        """Infinite (path, max_len) stream in (re-)shuffled shard order."""
        order = self._shard_order()
        while True:
            if self.shuffle:
                self._rng.shuffle(order)
            for file_idx in order:
                file, _ = self.files[file_idx]
                yield file, self.max_length

    def next_sample(self):
        """Decode the path stream, pipelined across a thread pool (the
        reference decodes serially in DataLoader workers)."""
        it = self._path_stream()
        if self._pool is None:
            for path, maxlen in it:
                yield self.reader.read(path, maxlen)
            return
        from collections import deque

        pending: deque = deque()
        for _ in range(self._lookahead):
            path, maxlen = next(it)
            pending.append(self._pool.submit(self.reader.read, path, maxlen))
        while True:
            path, maxlen = next(it)
            pending.append(self._pool.submit(self.reader.read, path, maxlen))
            yield pending.popleft().result()

    def _snap(self, length: int) -> int:
        if not self.length_grid:
            return length
        snapped = find_fit(length, self.length_grid)
        return snapped if snapped > 0 else length

    def __iter__(self):
        min_length = self.max_length
        num_tokens_predicted = 0
        samples: List[np.ndarray] = []
        for sample in self.next_sample():
            if num_tokens_predicted < self.target_tokens_per_batch:
                min_length = min(min_length, len(sample))
                samples.append(sample)
                num_tokens_predicted = len(samples) * min_length
            else:
                t = self._snap(min_length)
                batch = np.stack([s[:t] for s in samples])
                samples = []
                num_tokens_predicted = 0
                min_length = self.max_length
                yield batch


class BucketingAudioDataset(AudioFileDataset):
    """Assign each file to the largest bucket <= its length; emit batches
    cropped to the bucket length — fully static shapes (data.py:439-480)."""

    def __init__(self, buckets, manifest, max_length, target_tokens_per_batch,
                 shuffle=True, min_length=0, shard_index=0, num_shards=1,
                 seed=0, read_workers=4):
        self.bucket_lengths = buckets
        super().__init__(
            manifest, max_length, target_tokens_per_batch, shuffle=shuffle,
            min_length=min_length, shard_index=shard_index,
            num_shards=num_shards, seed=seed, read_workers=read_workers,
        )

    def _read_manifest(self, manifest: str, _min_length) -> None:
        skipped = 0
        asc = sorted(self.bucket_lengths)
        self.files_by_bucket: Dict[int, List[tuple]] = {b: [] for b in asc}
        num_samples = 0
        with open(manifest) as f:
            directory = f.readline().strip()
            for line in f:
                num_samples += 1
                items = line.strip().split("\t")
                sz = int(items[1])
                fname = os.path.join(directory, items[0])
                if sz < asc[0]:
                    skipped += 1
                    continue
                bucket = find_fit(sz, self.bucket_lengths)
                self.files_by_bucket[bucket].append((fname, sz))
        self.files = [(f, s) for b in asc for (f, s) in self.files_by_bucket[b]]
        logger.info("Num samples %d, skipped %d", num_samples, skipped)

    def _bucket_order(self) -> List[int]:
        keys = sorted(self.files_by_bucket.keys())
        order = list(range(self.shard_index, len(keys), self.num_shards))
        return order or list(range(len(keys)))

    def _path_stream(self):
        keys = sorted(self.files_by_bucket.keys())
        order = self._bucket_order()
        while True:
            if self.shuffle:
                self._rng.shuffle(order)
            for bucket_idx in order:
                bucket = keys[bucket_idx]
                for (file, _) in self.files_by_bucket[bucket]:
                    yield file, bucket


class PrefetchLoader:
    """Thread-based background prefetcher replacing torch DataLoader workers
    (the reference forks 4 worker processes, train.py:192)."""

    _DONE = object()

    def __init__(self, dataset, num_workers: int = 2, prefetch: int = 4):
        self.dataset = dataset
        self.prefetch = max(prefetch, 1)

    def __iter__(self):
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
