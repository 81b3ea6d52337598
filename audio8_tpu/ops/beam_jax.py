"""On-device (jittable, batched) CTC prefix beam search — no LM.

The reference delegates beam decode to the host ctcdecode C++ binding
(/root/reference/audio8/ctc.py:11-60); ours additionally has a host C++
trie (csrc/beam.cc) and a Python fallback (ops/beam.py). This module is
the TPU-native third path: the whole search is one ``lax.scan`` over
frames, vectorized over (batch, beam, vocab), so batched beam decoding
runs on-device with no per-utterance host round-trip. LM fusion stays on
the host paths (the trie/ARPA walk is pointer-chasing, wrong for the
VPU).

Algorithm (Hannun et al. 2014), same scoring as ops/beam.py without LM:
per frame each live prefix yields a "keep" candidate (absorb blank /
repeat last) and V-1 "extend" candidates; identical prefixes must MERGE
(log-add) — the classic obstacle to vectorization, since prefixes are
unbounded. We merge by rolling hash: candidates lexicographically sort
by a pair of independent 32-bit hashes (``lax.sort`` with num_keys=2 —
no x64 needed), equal-hash runs segment-logsumexp their (p_b, p_nb),
the first of each run survives as representative (stable sort keeps the
"keep" candidate first, preserving its backpointer), and ``lax.top_k``
selects the best K by ``logsumexp(p_b, p_nb) + beta * n_words`` (the
ctcdecode word-insertion bonus, tracked incrementally). Prefixes are
never materialized — each step emits (parent, token) backpointers and
sequences are rebuilt on host after the scan (an O(T*K) numpy walk).

Hash-collision probability over a decode is ~ (T * K * V)^2 / 2^64 —
negligible with the two independent 32-bit hashes.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1.0e30


def _logaddexp(a, b):
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    return mx + jnp.log1p(jnp.exp(jnp.maximum(mn - mx, NEG)))


@functools.partial(jax.jit,
                   static_argnames=("beam", "blank", "space", "beta"))
def beam_search_scan(log_probs: jnp.ndarray,
                     frame_lengths: Optional[jnp.ndarray] = None,
                     *, beam: int = 8, blank: int = 0, space: int = -1,
                     beta: float = 0.0):
    """Run the scan. log_probs: (B, T, V) log-probs.

    Returns (parents (T, B, K) int32, tokens (T, B, K) int32 [-1 = keep],
    scores (B, K) f32, desc-sorted) — feed the first two to
    :func:`backtrace`.
    """
    b_sz, t_len, v = log_probs.shape
    k = beam
    m = k * v  # k keep candidates + k*(v-1) extensions
    ext_syms = jnp.asarray([s for s in range(v) if s != blank], jnp.int32)
    mul1, mul2 = jnp.uint32(1000003), jnp.uint32(2654435761)
    arange_k = jnp.arange(k, dtype=jnp.int32)

    # beam 0 = live empty prefix; the rest are -inf duds with distinct
    # hashes so they can never hash-merge with a real prefix
    init = dict(
        h1=jnp.tile(jnp.arange(1, k + 1, dtype=jnp.uint32)[None], (b_sz, 1)),
        h2=jnp.tile((jnp.arange(1, k + 1, dtype=jnp.uint32) * 7919)[None],
                    (b_sz, 1)),
        p_b=jnp.full((b_sz, k), NEG).at[:, 0].set(0.0),
        p_nb=jnp.full((b_sz, k), NEG),
        last=jnp.full((b_sz, k), -1, jnp.int32),
        plen=jnp.zeros((b_sz, k), jnp.int32),
        nwords=jnp.zeros((b_sz, k), jnp.int32),
    )
    lengths = (jnp.full((b_sz,), t_len, jnp.int32) if frame_lengths is None
               else frame_lengths.astype(jnp.int32))
    seg_offset = (jnp.arange(b_sz, dtype=jnp.int32)[:, None] * m)

    def step(state, inp):
        lp, t = inp  # lp: (B, V) this frame's log-probs
        lp = lp.astype(jnp.float32)
        p_tot = _logaddexp(state["p_b"], state["p_nb"])  # (B, K)

        # keep candidates (same prefix): absorb blank; repeat last symbol
        keep_pb = p_tot + lp[:, blank][:, None]
        lp_last = jnp.take_along_axis(lp, jnp.maximum(state["last"], 0),
                                      axis=-1)
        keep_pnb = jnp.where(state["last"] >= 0,
                             state["p_nb"] + lp_last, NEG)

        # extend candidates (B, K, V-1)
        lp_ext = lp[:, ext_syms]
        is_rep = state["last"][:, :, None] == ext_syms[None, None, :]
        base = jnp.where(is_rep, state["p_b"][:, :, None], p_tot[:, :, None])
        ext_pnb = base + lp_ext[:, None, :]
        sym_u = (ext_syms + 1).astype(jnp.uint32)
        ext_h1 = state["h1"][:, :, None] * mul1 + sym_u[None, None, :]
        ext_h2 = state["h2"][:, :, None] * mul2 + sym_u[None, None, :]
        new_word = ((ext_syms[None, None, :] == space)
                    & (state["last"][:, :, None] != space)
                    & (state["plen"][:, :, None] > 0))

        def kv(x):  # (B, K, V-1) -> (B, K*(V-1))
            return x.reshape(b_sz, k * (v - 1))

        def bc(x):  # broadcast (B, K, 1)-style to (B, K*(V-1))
            return kv(jnp.broadcast_to(x, (b_sz, k, v - 1)))

        # candidate table (B, M); keeps first so the stable sort makes a
        # kept prefix the representative of any run it shares
        cat = lambda a, b: jnp.concatenate([a, b], axis=1)
        h1 = cat(state["h1"], kv(ext_h1))
        h2 = cat(state["h2"], kv(ext_h2))
        p_b = cat(keep_pb, jnp.full((b_sz, k * (v - 1)), NEG))
        p_nb = cat(keep_pnb, kv(ext_pnb))
        parent = cat(jnp.tile(arange_k[None], (b_sz, 1)),
                     bc(arange_k[None, :, None]))
        token = cat(jnp.full((b_sz, k), -1, jnp.int32),
                    bc(ext_syms[None, None, :]))
        last = cat(state["last"], bc(ext_syms[None, None, :]))
        plen = cat(state["plen"], bc(state["plen"][:, :, None] + 1))
        nwords = cat(state["nwords"],
                     kv(state["nwords"][:, :, None]
                        + new_word.astype(jnp.int32)))

        # lexicographic stable sort by the hash pair
        (h1_s, h2_s, pb_s, pnb_s, parent_s, token_s, last_s, plen_s,
         nwords_s) = jax.lax.sort(
            (h1, h2, p_b, p_nb, parent, token, last, plen, nwords),
            dimension=1, num_keys=2, is_stable=True)

        first = jnp.concatenate(
            [jnp.ones((b_sz, 1), bool),
             (h1_s[:, 1:] != h1_s[:, :-1]) | (h2_s[:, 1:] != h2_s[:, :-1])],
            axis=1)
        seg = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1  # (B, M)
        ids = (seg + seg_offset).ravel()

        def seg_lse(x):
            flat = x.ravel()
            mx = jnp.maximum(jax.ops.segment_max(flat, ids,
                                                 num_segments=b_sz * m), NEG)
            ssum = jax.ops.segment_sum(jnp.exp(flat - mx[ids]), ids,
                                       num_segments=b_sz * m)
            per_seg = mx + jnp.log(jnp.maximum(ssum, 1e-38))
            return per_seg[ids].reshape(b_sz, m)

        merged_pb = seg_lse(pb_s)
        merged_pnb = seg_lse(pnb_s)
        score = jnp.where(
            first,
            _logaddexp(merged_pb, merged_pnb)
            + beta * nwords_s.astype(jnp.float32),
            NEG)

        _, top_idx = jax.lax.top_k(score, k)

        def pick(x):
            return jnp.take_along_axis(x, top_idx, axis=1)

        new_state = dict(h1=pick(h1_s), h2=pick(h2_s), p_b=pick(merged_pb),
                         p_nb=pick(merged_pnb), last=pick(last_s),
                         plen=pick(plen_s), nwords=pick(nwords_s))
        out_parent = pick(parent_s)
        out_token = pick(token_s)

        # frames beyond this row's valid length: identity update
        valid = (t < lengths)[:, None]
        new_state = {key: jnp.where(valid, val, state[key])
                     for key, val in new_state.items()}
        out_parent = jnp.where(valid, out_parent,
                               jnp.tile(arange_k[None], (b_sz, 1)))
        out_token = jnp.where(valid, out_token, -1)
        return new_state, (out_parent, out_token)

    lp_seq = jnp.moveaxis(log_probs, 1, 0)  # (T, B, V)
    state, (parents, tokens) = jax.lax.scan(
        step, init, (lp_seq, jnp.arange(t_len, dtype=jnp.int32)))
    scores = (_logaddexp(state["p_b"], state["p_nb"])
              + beta * state["nwords"].astype(jnp.float32))
    return parents, tokens, scores


def backtrace(parents: np.ndarray, tokens: np.ndarray) -> list:
    """(T, B, K) backpointers -> per-row list of K id-sequences (beam
    order preserved). Host-side numpy walk."""
    parents = np.asarray(parents)
    tokens = np.asarray(tokens)
    t_len, b_sz, k = parents.shape
    out = []
    for b in range(b_sz):
        row = []
        for kk in range(k):
            seq = []
            cur = kk
            for t in range(t_len - 1, -1, -1):
                tok = tokens[t, b, cur]
                if tok >= 0:
                    seq.append(int(tok))
                cur = int(parents[t, b, cur])
            row.append(seq[::-1])
        out.append(row)
    return out


def ctc_beam_search_jax(log_probs, frame_lengths=None, *, beam: int = 8,
                        blank: int = 0, space: int = -1, beta: float = 0.0
                        ) -> Tuple[list, np.ndarray]:
    """Batched on-device prefix beam search.

    Returns (nbest, scores): ``nbest[b]`` is the list of ``beam`` id
    sequences for row b in descending score order; ``scores`` is
    (B, beam) float32 (log prob + beta * completed-word count).
    """
    log_probs = jnp.asarray(log_probs)
    fl = None if frame_lengths is None else jnp.asarray(frame_lengths)
    parents, tokens, scores = beam_search_scan(
        log_probs, fl, beam=beam, blank=blank, space=space, beta=beta)
    return backtrace(parents, tokens), np.asarray(scores)
