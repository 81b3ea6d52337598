"""Seq2seq ASR model: wav2vec2 encoder + transformer decoder.

Replaces Seq2Seq (/root/reference/audio8/wav2vec2.py:979-1006). The
reference's batched greedy decode re-runs the full decoder over the whole
prefix every step (O(L^2), noted in SURVEY.md §3.5); here decode is a
KV-cached ``lax.while_loop`` with static shapes — O(L) and jit-compiled.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from audio8_tpu.config import DecoderConfig, EncoderConfig
from audio8_tpu.models.text import TextTransformerDecoder
from audio8_tpu.models.wav2vec2 import Wav2Vec2Encoder
from audio8_tpu.ops.masks import sequence_mask
from audio8_tpu.utils import Offsets

Dtype = Any


class Seq2Seq(nn.Module):
    encoder_config: EncoderConfig
    decoder_config: DecoderConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Wav2Vec2Encoder(config=self.encoder_config,
                                       dtype=self.dtype, param_dtype=self.param_dtype)
        self.decoder = TextTransformerDecoder(config=self.decoder_config,
                                              dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, x, input_lengths, dst, dst_lengths, train: bool = False,
                 freeze: bool = True):
        """Teacher-forced forward: returns (B, T_dst, V) log-probs."""
        dst_mask = sequence_mask(dst_lengths, dst.shape[1])
        memory, src_pad_mask = self.encoder(x, input_lengths, train)
        if freeze:
            memory = jax.lax.stop_gradient(memory)
        return self.decoder(memory, src_pad_mask, dst, dst_mask, train)

    def decode(self, x, input_lengths, max_output_len: int = 100):
        """Batched greedy decode with KV cache; starts from GO, stops when
        every row has emitted EOS (or at max_output_len). Returns
        (tokens (B, max_output_len), lengths (B,)); positions after EOS are
        PAD."""
        memory, src_pad_mask = self.encoder(x, input_lengths, train=False)
        b = x.shape[0]
        cross_kv = self.decoder.compute_cross_kv(memory)  # project memory once
        cache = self.decoder.init_cache(b, max_output_len + 1)
        tokens = jnp.full((b, max_output_len), Offsets.PAD, jnp.int32)
        tok = jnp.full((b, 1), Offsets.GO, jnp.int32)
        done = jnp.zeros((b,), jnp.bool_)

        def cond(state):
            i, _, _, done, _ = state
            return (i < max_output_len) & (~jnp.all(done))

        def body(state):
            i, tok, tokens, done, cache = state
            log_probs, cache = self.decoder.step(memory, src_pad_mask, tok,
                                                 cache, cross_kv=cross_kv)
            best = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
            best = jnp.where(done, Offsets.PAD, best)
            tokens = jax.lax.dynamic_update_slice(tokens, best[:, None], (0, i))
            done = done | (best == Offsets.EOS)
            return i + 1, best[:, None], tokens, done, cache

        _, _, tokens, done, _ = jax.lax.while_loop(
            cond, body, (jnp.array(0, jnp.int32), tok, tokens, done, cache))
        lengths = jnp.sum((tokens != Offsets.PAD), axis=-1)
        return tokens, lengths

    def decode_beam(self, x, input_lengths, beam: int = 4,
                    max_output_len: int = 100, length_penalty: float = 0.6):
        """Batched beam-search decode with KV cache — an extension beyond
        the reference, whose Seq2Seq decodes greedily only
        (/root/reference/audio8/wav2vec2.py:991-1006).

        TPU-native shape discipline: B*K rows flow through the same
        cached ``step`` as greedy decode; beam reordering is a gather on
        the leading axis of every cache leaf inside ``lax.while_loop``.
        Finished hypotheses persist by forcing a PAD continuation at
        unchanged score. Returns (tokens (B, max_output_len), lengths):
        the best hypothesis per row under GNMT length normalization
        ``score / ((5+len)/6)**length_penalty``.
        """
        k = beam
        if k <= 1:
            return self.decode(x, input_lengths, max_output_len)
        memory, src_pad_mask = self.encoder(x, input_lengths, train=False)
        b = x.shape[0]
        v = self.decoder_config.vocab_size
        cross_kv = self.decoder.compute_cross_kv(memory)
        expand = lambda t: jnp.repeat(t, k, axis=0)  # row b*k + j <- utt b
        memory = expand(memory)
        src_pad_mask = None if src_pad_mask is None else expand(src_pad_mask)
        cross_kv = jax.tree_util.tree_map(expand, cross_kv)
        cache = self.decoder.init_cache(b * k, max_output_len + 1)

        neg_inf = jnp.float32(-1e9)
        tokens = jnp.full((b, k, max_output_len), Offsets.PAD, jnp.int32)
        tok = jnp.full((b * k, 1), Offsets.GO, jnp.int32)
        # only beam 0 live at step 0 so the first expansion seeds k
        # DISTINCT tokens instead of k copies of the argmax
        scores = jnp.tile(jnp.where(jnp.arange(k) == 0, 0.0, neg_inf)[None],
                          (b, 1))
        done = jnp.zeros((b, k), jnp.bool_)

        def cond(state):
            i, _, _, _, done, _ = state
            return (i < max_output_len) & (~jnp.all(done))

        def body(state):
            i, tok, tokens, scores, done, cache = state
            log_probs, cache = self.decoder.step(memory, src_pad_mask, tok,
                                                 cache, cross_kv=cross_kv)
            lp = log_probs.reshape(b, k, v).astype(jnp.float32)
            # finished rows: only PAD continues, at unchanged score
            pad_only = jnp.full((v,), neg_inf).at[Offsets.PAD].set(0.0)
            lp = jnp.where(done[..., None], pad_only[None, None, :], lp)
            cand = scores[..., None] + lp              # (B, K, V)
            top_scores, flat = jax.lax.top_k(cand.reshape(b, k * v), k)
            parent = flat // v                          # (B, K)
            best = (flat % v).astype(jnp.int32)
            # reorder beam state by parent
            take = lambda arr: jnp.take_along_axis(arr, parent, axis=1)
            tokens = jnp.take_along_axis(
                tokens, parent[..., None], axis=1)
            tokens = jax.lax.dynamic_update_slice(
                tokens, best[..., None], (0, 0, i))
            done = take(done) | (best == Offsets.EOS)
            # cache rows live at b*k + j: gather with flat parent indices
            flat_parent = (jnp.arange(b)[:, None] * k + parent).reshape(-1)
            cache = jax.tree_util.tree_map(
                lambda l: jnp.take(l, flat_parent, axis=0)
                if getattr(l, "ndim", 0) >= 1 and l.shape[0] == b * k else l,
                cache)
            return (i + 1, best.reshape(b * k, 1), tokens, top_scores,
                    done, cache)

        _, _, tokens, scores, done, _ = jax.lax.while_loop(
            cond, body,
            (jnp.array(0, jnp.int32), tok, tokens, scores, done, cache))
        # best beam per row under GNMT length normalization; EOS/PAD tail
        # excluded from the reported length
        emitted = jnp.sum((tokens != Offsets.PAD)
                          & (tokens != Offsets.EOS), axis=-1)
        lp_norm = ((5.0 + emitted.astype(jnp.float32)) / 6.0) ** length_penalty
        best_beam = jnp.argmax(scores / lp_norm, axis=-1)
        out = jnp.take_along_axis(
            tokens, best_beam[:, None, None], axis=1)[:, 0]
        lengths = jnp.sum(out != Offsets.PAD, axis=-1)  # EOS kept, as in decode()
        return out, lengths


def create_seq2seq_model(
    vocab_size: int,
    encoder_config: Optional[EncoderConfig] = None,
    decoder_config: Optional[DecoderConfig] = None,
    dtype=jnp.float32,
    **kwargs,
) -> Seq2Seq:
    """Factory mirroring create_seq2seq_model
    (/root/reference/audio8/train_seq2seq.py:38-92): 12-layer encoder,
    2-layer/4-head decoder with learned-positional tied embeddings."""
    enc = encoder_config or EncoderConfig(
        **{k: v for k, v in kwargs.items() if k in EncoderConfig.__dataclass_fields__})
    dec = decoder_config or DecoderConfig(
        vocab_size=vocab_size,
        d_model=enc.d_model,
        num_heads=int(kwargs.get("decoder_heads", 4)),
        num_layers=int(kwargs.get("decoder_layers", 2)),
        dropout=float(kwargs.get("decoder_dropout", 0.1)),
        layer_drop=float(kwargs.get("decoder_layer_drop", 0.0)),
    )
    return Seq2Seq(encoder_config=enc, decoder_config=dec, dtype=dtype)
