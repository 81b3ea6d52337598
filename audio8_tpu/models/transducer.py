"""RNN-T (transducer) ASR model: wav2vec2 encoder + LSTM prediction
network + additive joint.

A model family beyond the reference (audio8's ASR heads are CTC,
/root/reference/audio8/wav2vec2.py:726-770, and attention seq2seq,
wav2vec2.py:979-1006): the transducer factorizes P(y | x) over
monotonic frame-synchronous alignments with label-history conditioning
— the standard topology for streaming ASR, trained with
``ops.transducer.transducer_loss``.

TPU-native shape discipline mirrors the rest of the zoo: the training
forward produces the full (B, T', U+1, V) joint tensor in one fused
program (V is a letter/BPE vocab, so the tensor is small and the
log-softmax fuses into the lattice scan), and greedy decode is a jitted
``lax.fori_loop`` over frames whose per-row LSTM state advances only on
emissions — static shapes, no host round-trips (the reference's decode
loops run per step in Python).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from audio8_tpu.config import TransducerConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2Encoder
from audio8_tpu.nn.embeddings import LookupTableEmbeddings
from audio8_tpu.nn.dropout import Dropout
from audio8_tpu.nn.layers import Dense
from audio8_tpu.utils import Offsets

Dtype = Any


class TransducerPredictor(nn.Module):
    """Label-history network: embed -> stacked LSTM.

    ``__call__`` runs the whole (GO-prefixed) label sequence for
    training; ``step`` advances one token for decode, carrying the
    per-layer (c, h) states explicitly so the greedy loop stays inside
    one XLA program.
    """

    vocab_size: int
    num_layers: int = 2
    d_model: int = 512
    embed_dim: int = 256
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embed = LookupTableEmbeddings(
            vocab_size=self.vocab_size, features=self.embed_dim, **dd)
        self.rnns = [
            nn.RNN(nn.OptimizedLSTMCell(features=self.d_model, **dd),
                   name=f"rnn_{i}")
            for i in range(self.num_layers)]
        self.drop = Dropout(self.dropout)

    def init_carry(self, batch: int):
        zeros = jnp.zeros((batch, self.d_model), self.dtype)
        # OptimizedLSTMCell carry = (c, h)
        return [(zeros, zeros) for _ in range(self.num_layers)]

    def __call__(self, ids: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, U1) token ids -> (B, U1, d_model) prediction states."""
        x = self.embed(ids)
        x = self.drop(x, deterministic=not train)
        for rnn in self.rnns:
            x = rnn(x)
            x = self.drop(x, deterministic=not train)
        return x

    def step(self, carry, tok: jnp.ndarray):
        """One decode step. tok: (B,) int32; returns (out (B, d), carry).

        Routes through each RNN's own cell so the decode path shares the
        sequence path's parameters.
        """
        x = self.embed(tok)
        new_carry = []
        for rnn in self.rnns:
            c, x = rnn.cell(carry[len(new_carry)], x)
            new_carry.append(c)
        return x, new_carry


class TransducerJoint(nn.Module):
    """Additive joint: tanh(W_e enc + W_p pred) -> vocab logits."""

    vocab_size: int
    d_joint: int = 512
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.enc_proj = Dense(self.d_joint, **dd)
        self.pred_proj = Dense(self.d_joint, **dd)
        self.out = Dense(self.vocab_size, **dd)

    def __call__(self, enc: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
        """enc (B, T, d_e), pred (B, U1, d_p) -> logits (B, T, U1, V)."""
        e = self.enc_proj(enc)[:, :, None, :] + self.pred_proj(pred)[:, None]
        return self.out(jnp.tanh(e)).astype(jnp.float32)

    def single(self, enc_t: jnp.ndarray, pred_u: jnp.ndarray) -> jnp.ndarray:
        """One lattice node per row: (B, d_e), (B, d_p) -> (B, V)."""
        e = self.enc_proj(enc_t) + self.pred_proj(pred_u)
        return self.out(jnp.tanh(e)).astype(jnp.float32)


class Transducer(nn.Module):
    """Encoder + predictor + joint; blank = ``Offsets.GO`` (the CTC
    blank convention shared across this framework's decode surfaces)."""

    config: TransducerConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = Wav2Vec2Encoder(config=cfg, **dd)
        self.predictor = TransducerPredictor(
            vocab_size=cfg.vocab_size, num_layers=cfg.pred_layers,
            d_model=cfg.pred_dim, embed_dim=cfg.pred_embed_dim,
            dropout=cfg.pred_dropout, **dd)
        self.joint = TransducerJoint(
            vocab_size=cfg.vocab_size, d_joint=cfg.d_joint, **dd)

    def __call__(self, x, input_lengths, targets, train: bool = False,
                 freeze: bool = True):
        """Training forward.

        targets: (B, U) label ids (no GO/EOS). Returns (log_probs
        (B, T', U+1, V) float32, pad_mask) — feed to transducer_loss.
        """
        enc, pad_mask = self.encoder(x, input_lengths, train)
        if freeze:
            enc = jax.lax.stop_gradient(enc)
        b = targets.shape[0]
        go = jnp.full((b, 1), Offsets.GO, targets.dtype)
        pred = self.predictor(jnp.concatenate([go, targets], axis=1), train)
        logits = self.joint(enc, pred)
        return jax.nn.log_softmax(logits, axis=-1), pad_mask

    def encode(self, x, input_lengths):
        """Encoder features for decode: (B, T) waveform -> (enc (B, T', D),
        frame_lengths (B,)). The chunked/streaming transducer path
        (serve.TransducerStreamer) stitches these across fixed-shape
        chunks before running ``decode_frames``."""
        enc, pad_mask = self.encoder(x, input_lengths, train=False)
        b, t_max, _ = enc.shape
        frame_lengths = (jnp.sum(pad_mask, axis=-1).astype(jnp.int32)
                         if pad_mask is not None
                         else jnp.full((b,), t_max, jnp.int32))
        return enc, frame_lengths

    def decode_init(self, batch: int):
        """Fresh decode state: the predictor advanced once on blank.

        Returns ``(pred_out (B, d_p), carry)`` — combine with an all-PAD
        token buffer and ``n = 0`` for the full resumable state."""
        carry = self.predictor.init_carry(batch)
        return self.predictor.step(
            carry, jnp.full((batch,), Offsets.GO, jnp.int32))

    def decode_frames(self, enc, frame_lengths, tokens, n, pred_out, carry,
                      max_symbols_per_frame: int = 4):
        """Resumable greedy lattice search over one window of encoder
        frames.

        Threads ``(tokens, n, pred_out, carry)`` in and out so arbitrarily
        long audio decodes through fixed-shape windows in ONE compiled
        program: the caller stitches encoder features chunk by chunk and
        keeps feeding windows, exactly like the reference-free streaming
        CTC path but with label-history state. Frames at ``t >=
        frame_lengths[row]`` are inert for that row.
        """
        b, t_max, _ = enc.shape
        max_output_len = tokens.shape[1]
        blank = Offsets.GO
        rows = jnp.arange(b)

        def frame_body(t, state):
            tokens, n, pred_out, carry = state
            enc_t = enc[:, t]
            active_t = t < frame_lengths

            def emit_body(_, inner):
                tokens, n, pred_out, carry, live = inner
                logits = self.joint.single(enc_t, pred_out)
                best = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                emit = (live & active_t & (best != blank)
                        & (n < max_output_len))
                pos = jnp.minimum(n, max_output_len - 1)
                tokens = tokens.at[rows, pos].set(
                    jnp.where(emit, best, tokens[rows, pos]))
                new_out, new_carry = self.predictor.step(
                    carry, jnp.where(emit, best, blank))
                sel = emit[:, None]
                pred_out = jnp.where(sel, new_out, pred_out)
                carry = [(jnp.where(sel, c2, c1), jnp.where(sel, h2, h1))
                         for (c1, h1), (c2, h2) in zip(carry, new_carry)]
                n = n + emit.astype(jnp.int32)
                return tokens, n, pred_out, carry, emit

            live = jnp.ones((b,), bool)
            tokens, n, pred_out, carry, _ = jax.lax.fori_loop(
                0, max_symbols_per_frame, emit_body,
                (tokens, n, pred_out, carry, live))
            return tokens, n, pred_out, carry

        return jax.lax.fori_loop(
            0, t_max, frame_body, (tokens, n, pred_out, carry))

    def decode(self, x, input_lengths, max_output_len: int = 200,
               max_symbols_per_frame: int = 4):
        """Batched greedy transducer decode, one XLA program.

        Per frame, emit argmax labels (advancing the predictor state)
        until blank, a per-frame emission cap, or the output budget.
        Returns (tokens (B, max_output_len) PAD-padded, lengths (B,)).
        """
        enc, frame_lengths = self.encode(x, input_lengths)
        b = enc.shape[0]
        pred_out, carry = self.decode_init(b)
        tokens = jnp.full((b, max_output_len), Offsets.PAD, jnp.int32)
        n = jnp.zeros((b,), jnp.int32)
        tokens, n, _, _ = self.decode_frames(
            enc, frame_lengths, tokens, n, pred_out, carry,
            max_symbols_per_frame)
        return tokens, n


def create_transducer_model(
    vocab_size: int,
    config: Optional[TransducerConfig] = None,
    dtype=jnp.float32,
    **kwargs,
) -> Transducer:
    """Factory in the shape of create_acoustic_model
    (/root/reference/audio8/wav2vec2.py:262-296) with the transducer
    head's knobs added."""
    cfg = config or TransducerConfig(
        vocab_size=vocab_size,
        **{k: v for k, v in kwargs.items()
           if k in TransducerConfig.__dataclass_fields__})
    return Transducer(config=cfg, dtype=dtype)
