"""Text-side components: vocab IO, vectorizers, encoders, decoder.

Replaces /root/reference/audio8/text.py. The BPE vectorizer re-implements
the subword-nmt merge application that mead-baseline's ``BPEVectorizer1D``
wraps (the '@@ ' continuation convention the metrics postproc expects,
/root/reference/audio8/ctc.py:69-72).
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audio8_tpu.config import DecoderConfig, TextEncoderConfig
from audio8_tpu.nn.embeddings import LearnedPositionalEmbeddings, LookupTableEmbeddings
from audio8_tpu.nn.pooling import MaxPool1D, MeanPool1D, Reduction
from audio8_tpu.nn.transformer import (
    TransformerDecoderStack,
    TransformerEncoderStack,
    subsequent_mask,
)
from audio8_tpu.ops.masks import sequence_mask
from audio8_tpu.utils import Offsets

Dtype = Any


# ---------------------------------------------------------------- vocab IO


def read_vocab_list(vocab_file: str) -> List[str]:
    """Specials (Offsets.VALUES) + one token per line (first whitespace
    field) — fairseq ``dict.ltr.txt`` format (text.py:22-30).

    A ``.json`` file is read as an HF ``vocab.json`` token->index map
    (specials already included at their indices), so HF checkpoints
    evaluate with their own symbol table — extension beyond the
    reference, which reads only fairseq dicts."""
    if vocab_file.endswith(".json"):
        import json

        with open(vocab_file) as rf:
            mapping = json.load(rf)
        vocab = ["<unused>"] * (max(mapping.values()) + 1)
        for tok, idx in mapping.items():
            vocab[idx] = tok
        return vocab
    vocab = list(Offsets.VALUES)
    with open(vocab_file) as rf:
        for line in rf:
            parts = line.split()
            if parts:
                vocab.append(parts[0])
    return vocab


def read_vocab_file(vocab_file: str) -> Dict[str, int]:
    return {v: i for i, v in enumerate(read_vocab_list(vocab_file))}


class TextVectorizer:
    """Dict-lookup tokenizer with optional begin/end emissions
    (text.py:38-58)."""

    def __init__(self, vocab: Dict[str, int], emit_begin_tok=(), emit_end_tok=()):
        self.vocab = vocab
        self._emit_begin_tok = list(emit_begin_tok)
        self._emit_end_tok = list(emit_end_tok)

    @property
    def emit_begin_tok(self):
        return self._emit_begin_tok

    @property
    def emit_end_tok(self):
        return self._emit_end_tok

    def run(self, tokens: Sequence[str]) -> np.ndarray:
        ids = (
            [self.vocab[t] for t in self._emit_begin_tok]
            + [self.vocab.get(t, Offsets.UNK) for t in tokens]
            + [self.vocab[t] for t in self._emit_end_tok]
        )
        return np.array(ids, dtype=np.int32)


class SubwordBPE:
    """Minimal subword-nmt BPE codec: apply merge rules from a codes file,
    emitting '@@'-suffixed continuation pieces."""

    def __init__(self, model_file: str):
        self.bpe_ranks: Dict[Tuple[str, str], int] = {}
        with open(model_file, encoding="utf-8") as f:
            for i, line in enumerate(f):
                if i == 0 and line.startswith("#version"):
                    continue
                parts = line.split()
                if len(parts) >= 2:
                    self.bpe_ranks.setdefault((parts[0], parts[1]), len(self.bpe_ranks))
        self._cache: Dict[str, List[str]] = {}

    def segment_word(self, word: str) -> List[str]:
        if not word:
            return []
        if word in self._cache:
            return self._cache[word]
        # subword-nmt v0.2: end-of-word is a separate '</w>' symbol
        symbols: List[str] = list(word) + ["</w>"]
        while len(symbols) > 1:
            pairs = [(symbols[i], symbols[i + 1]) for i in range(len(symbols) - 1)]
            ranked = [(self.bpe_ranks.get(p, 1 << 30), i, p) for i, p in enumerate(pairs)]
            best_rank, _, best = min(ranked)
            if best_rank >= 1 << 30:
                break
            merged: List[str] = []
            i = 0
            while i < len(symbols):
                if i < len(symbols) - 1 and (symbols[i], symbols[i + 1]) == best:
                    merged.append(symbols[i] + symbols[i + 1])
                    i += 2
                else:
                    merged.append(symbols[i])
                    i += 1
            symbols = merged
        if symbols and symbols[-1] == "</w>":
            symbols = symbols[:-1]
        elif symbols and symbols[-1].endswith("</w>"):
            symbols = symbols[:-1] + [symbols[-1][: -len("</w>")]]
        out = [s + "@@" for s in symbols[:-1]] + symbols[-1:]
        self._cache[word] = out
        return out


def learn_bpe(word_counts: Dict[str, int], num_merges: int,
              min_frequency: int = 2) -> List[Tuple[str, str]]:
    """Learn BPE merge rules from a word-frequency table.

    The subword-nmt ``learn_bpe`` algorithm (the external tool the
    reference's workflow needs to create the codes file that
    wrd2bpe.py consumes): start from characters + '</w>', repeatedly
    merge the most frequent adjacent symbol pair (ties broken by
    lexicographically LARGEST pair — subword-nmt's
    ``max(stats, key=lambda x: (stats[x], x))``), stop after
    ``num_merges`` or when the best pair's count drops below
    ``min_frequency``. Incremental pair-count maintenance: each merge
    re-examines only the words containing the merged pair.

    Returns the ordered merge list; write with :func:`write_bpe_codes`
    and apply with :class:`SubwordBPE` (same '</w>' end-of-word
    convention).
    """
    words: List[Tuple[List[str], int]] = [
        (list(w) + ["</w>"], c) for w, c in word_counts.items() if w]
    stats: Dict[Tuple[str, str], int] = {}
    index: Dict[Tuple[str, str], set] = {}
    for wi, (syms, c) in enumerate(words):
        for pair in zip(syms, syms[1:]):
            stats[pair] = stats.get(pair, 0) + c
            index.setdefault(pair, set()).add(wi)

    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        if not stats:
            break
        best = max(stats, key=lambda p: (stats[p], p))
        if stats[best] < min_frequency:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for wi in list(index.get(best, ())):
            syms, c = words[wi]
            # remove this word's old pair contributions
            for pair in zip(syms, syms[1:]):
                stats[pair] -= c
                if stats[pair] <= 0:
                    stats.pop(pair, None)
                idx = index.get(pair)
                if idx is not None:
                    idx.discard(wi)
                    if not idx:
                        index.pop(pair, None)
            merged: List[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    merged.append(new_sym)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            words[wi] = (merged, c)
            for pair in zip(merged, merged[1:]):
                stats[pair] = stats.get(pair, 0) + c
                index.setdefault(pair, set()).add(wi)
    return merges


def write_bpe_codes(path: str, merges: Sequence[Tuple[str, str]]) -> None:
    """Write merges in subword-nmt codes-file format (v0.2 header,
    readable back by :class:`SubwordBPE`)."""
    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")


class BPEVectorizer:
    """BPE segmentation + vocab lookup (text.py:61-85)."""

    def __init__(self, model_file: str, vocab_file: str, emit_begin_tok=(), emit_end_tok=()):
        self.bpe = SubwordBPE(model_file)
        self.vocab = read_vocab_file(vocab_file)
        self._emit_begin_tok = list(emit_begin_tok)
        self._emit_end_tok = list(emit_end_tok)

    @property
    def emit_begin_tok(self):
        return self._emit_begin_tok

    @property
    def emit_end_tok(self):
        return self._emit_end_tok

    def segment(self, tokens: Sequence[str]) -> List[str]:
        out: List[str] = []
        for t in tokens:
            out.extend(self.bpe.segment_word(t))
        return out

    def run(self, tokens: Sequence[str]) -> np.ndarray:
        pieces = (
            self._emit_begin_tok + self.segment(tokens) + self._emit_end_tok
        )
        return np.array(
            [self.vocab.get(p, Offsets.UNK) for p in pieces], dtype=np.int32
        )


# ---------------------------------------------------------------- encoders


class TextBoWPooledEncoder(nn.Module):
    """Embeddings + max/mean pooling (text.py:88-100)."""

    vocab_size: int
    d_model: int
    reduction_type: str = "mean"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.embeddings = LookupTableEmbeddings(
            vocab_size=self.vocab_size, features=self.d_model,
            dtype=self.dtype, param_dtype=self.param_dtype)
        self.pooler = MaxPool1D() if self.reduction_type == "max" else MeanPool1D()

    @property
    def output_dim(self):
        return self.d_model

    def __call__(self, ids, lengths, train: bool = False, freeze: bool = True):
        embedded = self.embeddings(ids)
        if freeze:
            embedded = jax.lax.stop_gradient(embedded)
        return self.pooler(embedded, lengths)


class TextTransformerPooledEncoder(nn.Module):
    """Embeddings + rpr-attention transformer + reduction (text.py:103-177)."""

    config: TextEncoderConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embeddings = LookupTableEmbeddings(
            vocab_size=cfg.vocab_size, features=cfg.d_model, **dd)
        self.transformer = TransformerEncoderStack(
            num_heads=cfg.num_heads, d_model=cfg.d_model,
            num_layers=cfg.num_layers, d_ff=cfg.d_ff,
            dropout_rate=cfg.dropout, activation="gelu", pre_norm=False,
            rpr_k=cfg.rpr_k, rpr_value_on=False, **dd)
        self.reduction = Reduction(
            reduction_type=cfg.reduction_type, d_model=cfg.d_model,
            d_k=cfg.reduction_d_k, dropout_rate=cfg.dropout, **dd)

    @property
    def output_dim(self):
        return self.config.d_model

    def __call__(self, ids, lengths, train: bool = False, freeze: bool = True):
        pad_mask = sequence_mask(lengths, ids.shape[1])
        embedded = self.embeddings(ids)
        encoded = self.transformer(embedded, pad_mask[:, None, None, :],
                                   deterministic=not train)
        if freeze:
            encoded = jax.lax.stop_gradient(encoded)
        return self.reduction(encoded, pad_mask, deterministic=not train)


class TextTransformerDecoder(nn.Module):
    """Target embeddings + decoder stack + weight-tied log-softmax output
    (text.py:180-230), with KV-cached single-step decode added."""

    config: DecoderConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.tgt_embeddings = LearnedPositionalEmbeddings(
            vocab_size=cfg.vocab_size, features=cfg.d_model,
            max_len=cfg.max_len, **dd)
        self.transformer = TransformerDecoderStack(
            num_heads=cfg.num_heads, d_model=cfg.d_model,
            num_layers=cfg.num_layers, d_ff=cfg.d_ff or 4 * cfg.d_model,
            dropout_rate=cfg.dropout, activation="gelu", pre_norm=True,
            scale=True, **dd)

    def _output(self, x):
        logits = self.tgt_embeddings.attend(x.astype(jnp.float32))
        return jax.nn.log_softmax(logits, axis=-1)

    def __call__(self, memory, src_pad_mask, dst, dst_pad_mask, train: bool = False):
        """memory: (B, T_src, C); src_pad_mask/dst_pad_mask: (B, T) bool."""
        embed = self.tgt_embeddings(dst)
        t = dst.shape[1]
        tgt_mask = subsequent_mask(t) & dst_pad_mask[:, None, None, :]
        src_mask = None if src_pad_mask is None else src_pad_mask[:, None, None, :]
        out = self.transformer(embed, memory, src_mask, tgt_mask,
                               deterministic=not train)
        return self._output(out)

    def init_cache(self, batch: int, max_len: int):
        return self.transformer.init_cache(batch, max_len)

    def compute_cross_kv(self, memory):
        """Precompute per-layer cross-attention K/V over the encoder output
        (projected once, reused every decode step)."""
        return self.transformer.compute_cross_kv(memory)

    def step(self, memory, src_pad_mask, tok, cache, cross_kv=None):
        """tok: (B, 1) current token; returns (log_probs (B, V), cache)."""
        embed = self.tgt_embeddings(tok, offset=cache["index"])
        src_mask = None if src_pad_mask is None else src_pad_mask[:, None, None, :]
        out, cache = self.transformer.step(embed, memory, src_mask, cache,
                                           cross_kv=cross_kv)
        return self._output(out)[:, 0], cache


class CausalTextLM(nn.Module):
    """Decoder-only text LM: embeddings + causal rpr-attention encoder
    stack + weight-tied log-softmax output.

    Beyond the reference (its only LM is the ARPA fusion inside the
    beam decoder, ctc.py:22-30): trained with ``a8t-train-lm`` on the
    transcript files the CTC recipes already use, then applied as an
    n-best rescorer (ops/rescore.py). Shaw relative attention (no
    absolute positions) scores any hypothesis length at eval regardless
    of the packed training block length.
    """

    config: Any  # TextLMConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embeddings = LookupTableEmbeddings(
            vocab_size=cfg.vocab_size, features=cfg.d_model, **dd)
        self.transformer = TransformerEncoderStack(
            num_heads=cfg.num_heads, d_model=cfg.d_model,
            num_layers=cfg.num_layers, d_ff=cfg.d_ff,
            dropout_rate=cfg.dropout, activation="gelu", pre_norm=True,
            rpr_k=cfg.rpr_k, rpr_value_on=False, **dd)

    def __call__(self, ids: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, L) token ids -> (B, L, V) next-token log-probs (position t
        predicts ids[:, t + 1])."""
        h = self.transformer(self.embeddings(ids),
                             subsequent_mask(ids.shape[1]),
                             deterministic=not train)
        logits = self.embeddings.attend(h.astype(jnp.float32))
        return jax.nn.log_softmax(logits, axis=-1)

    def sequence_logp(self, ids: jnp.ndarray,
                      lengths: jnp.ndarray) -> jnp.ndarray:
        """Total log-prob of each row: sum over t of
        ``log p(ids[t] | ids[:t])`` for 1 <= t < lengths (row 0 is the
        BOS/GO context; PAD tail masked out). Returns (B,)."""
        lp = self(ids, train=False)
        tgt = ids[:, 1:]
        tok_lp = jnp.take_along_axis(lp[:, :-1], tgt[..., None],
                                     axis=-1)[..., 0]
        pos = jnp.arange(tgt.shape[1])[None, :]
        valid = pos < (lengths[:, None] - 1)
        return jnp.sum(jnp.where(valid, tok_lp, 0.0), axis=-1)
