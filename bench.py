"""Benchmark: wav2vec2-base train-step throughput (pretrain + CTC).

Prints the JSON line {"metric", "value", "unit", "vs_baseline",
"extra_metrics"} the moment the headline is measured, and re-prints it
(with more extras filled in) after each additional workload completes —
every stdout line is complete and parseable, and the LAST line is the
authoritative one. An external kill at any point after ~2 min therefore
still leaves a valid artifact (the round-3 run was killed mid-extras with
nothing on stdout; never again).

Headline metric is the north-star from BASELINE.md: audio-sec/sec/chip
(RTFx) for wav2vec2-base contrastive pretraining (full fwd+bwd+update,
bf16 compute / fp32 params) at the reference's ~1.4M samples/batch
budget, batch geometry 16 x 82,000 samples (T'=256 — an operating point
of the reference's own bucketing/min-crop batcher; round 4 changed this
from 8 x 163,920, kept as the pretrain_long_clip extra — see
bench_pretrain and docs/PERF.md "Batch geometry"). ``vs_baseline`` is
measured throughput
divided by an estimated fairseq-on-A100 reference of 650
audio-sec/sec/chip, derived from the wav2vec 2.0 paper's published
training budget (BASE: 64 V100s, 400k updates, ~1.6h-audio batches,
~1.6 days -> ~260 audio-sec/sec/V100; A100 ~2.5x V100 bf16 -> ~650).
The BASELINE.json target of ">=2x A100" is vs_baseline >= 2.0.

``extra_metrics`` covers the other workloads (CTC fine-tune, seq2seq,
hubert, transducer, wav2vec2-large pretrain, greedy + chunked decode).
In 'all' mode the extras run in ROTATION order — ascending
last-certified round from the BENCH_r*.json artifacts in the cwd
(never-certified first; see _last_certified) — under a cost-gated
budget, so every workload gets an official number at least every other
round. Select a single workload with --workload.
"""
import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

def _setup_compile_cache() -> None:
    """Persistent XLA compilation cache: the extras' compile time (1-5
    min each through the remote-compile relay) dominates the bench
    budget; with the cache warm (any earlier run of the same program
    this round) all workloads fit easily. Called from main(), NOT at
    import time: an import-time config.update clobbered the test
    conftest's cache dir when tests imported this module for the
    rotation-policy tests, cold-compiling the whole fast lane."""
    try:  # pragma: no cover - best effort, harmless if unsupported
        if jax.config.jax_compilation_cache_dir:
            # already configured (e.g. the test conftest's cache when a
            # test drives main() in-process) — never replace it
            return
        cache_dir = os.environ.get("A8T_COMPILE_CACHE",
                                   "/tmp/a8t_xla_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_T0 = time.perf_counter()


def _note(msg: str) -> None:
    # progress heartbeat on stderr (stdout carries exactly one JSON line);
    # the axon relay can wedge silently, so make phases visible
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)

A100_BASELINE_AUDIO_SEC_PER_SEC = 650.0
SAMPLE_RATE = 16_000


def bench_pretrain(n_steps: int = 20, *, d_model: int = 768,
                   num_heads: int = 12, num_layers: int = 12,
                   d_ff: int = 3072, final_dim: int = 256,
                   b: int = 16, t: int = 82_000) -> float:
    from audio8_tpu.config import PretrainConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2Model
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_pretrain_steps

    # Default = wav2vec2-base; dense min-cropped pretraining batch at the
    # reference's ~1.4M samples/batch budget. Geometry (round 4,
    # tools/exp_batch_geom_r4.py + docs/PERF.md "Batch geometry"):
    # 16 x 82,000 samples = 82 audio-sec/step, T'=256 (lane-aligned,
    # 2 MXU tiles). This is an operating point of the reference's OWN
    # pipeline at the same budget: its default bucket list includes
    # 83,333 (-> B=16 at tokens_per_batch=1.4M,
    # /root/reference/audio8/pretrain.py:56-60), and its default
    # min-crop batcher (data.py:409-426) closes typical LibriSpeech
    # batches at ~5-8 s clips. The long-clip 8 x 163,920 (T'=512) point
    # benched through round 3 is kept as the pretrain_long_clip extra
    # for cross-round continuity. The 'large' workload scales dims the
    # way the reference would (--d_model 1024 --num_layers 24 ...,
    # post-norm throughout; pretrain.py:39-42 same knobs).
    _note(f"pretrain d_model={d_model} L={num_layers}: build + compile")
    cfg = PretrainConfig(d_model=d_model, num_heads=num_heads,
                         num_layers=num_layers, d_ff=d_ff,
                         final_dim=final_dim, dropout=0.1)
    model = Wav2Vec2Model(config=cfg, dtype=jnp.bfloat16)
    # default t: conv_output_length(163,920) == 512 exactly (lane-aligned)

    rng = np.random.default_rng(0)
    signal = jnp.asarray(rng.normal(size=(b, t)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    params = model.init(rngs, signal[:1, :16000], train=True)["params"]

    tx = create_optimizer(create_lrs(5e-4, 1000, warmup_steps=10),
                          weight_decay=0.01)
    state = TrainState.create(params, tx)
    train_step, _ = make_pretrain_steps(model, tx, clip=1.0, n_negatives=100)

    # pre-split step keys so the timed loop is pure train-step dispatches
    keys = list(jax.random.split(jax.random.PRNGKey(7), n_steps + 1))

    # warmup/compile (np.asarray forces a real host sync on the async relay)
    state, metrics = train_step(state, signal, keys[-1])
    np.asarray(metrics["loss"])
    _note("pretrain: compiled, timing")

    start = time.perf_counter()
    for i in range(n_steps):
        state, metrics = train_step(state, signal, keys[i])
    np.asarray(metrics["loss"])
    elapsed = time.perf_counter() - start

    audio_sec_per_step = b * t / SAMPLE_RATE
    return audio_sec_per_step * n_steps / elapsed / jax.device_count()


def bench_pretrain_large(n_steps: int = 12) -> float:
    """wav2vec2-large-shaped pretraining (d_model 1024, 24 layers, 16
    heads, d_ff 4096, final_dim 768 — the paper's LARGE dims on the
    reference's post-norm architecture)."""
    return bench_pretrain(n_steps, d_model=1024, num_heads=16,
                          num_layers=24, d_ff=4096, final_dim=768)


def bench_ctc(freeze: bool, n_steps: int = 30, *, b: int = 16,
              t: int = 41_359, **cfg_kwargs) -> float:
    """CTC fine-tune step (train.py workload): wav2vec2-base + letter
    head, 16 x 41,359 samples = 41.4 audio-sec/step. The clip length is
    the shape train.py's lane-aligned data pipeline emits (T'=128 = one
    MXU tile exactly; config.lane_aligned_pad) and respects the
    reference's 700k-sample batch budget (661,744 samples;
    /root/reference/audio8/train.py:112). Measured +4.4% over the old
    T'=149 shape (tools/exp_ctc_lane_align.py); T'=256 clips reach 2203
    audio-sec/sec but need a 1.3M-sample budget (docs/PERF.md §CTC)."""
    from audio8_tpu.config import AcousticConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_ctc_steps
    from audio8_tpu.utils import Offsets

    Offsets.remap_fairseq_ctc()
    cfg = AcousticConfig(num_labels=32, d_ff=3072, dropout=0.1,
                         timestep_masking=0.5, channel_masking=0.1,
                         **cfg_kwargs)
    model = Wav2Vec2AcousticModel(config=cfg, dtype=jnp.bfloat16)
    u = 64  # default (b, t): T'=128 exactly (lane-aligned pipeline shape)

    rng = np.random.default_rng(0)
    batch = {
        "signal": jnp.asarray(rng.normal(size=(b, t)).astype(np.float32)),
        "signal_lengths": jnp.full((b,), t, jnp.int32),
        "token_ids": jnp.asarray(rng.integers(4, 32, size=(b, u)), jnp.int32),
        "token_lengths": jnp.full((b,), u, jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["signal"][:1],
                        batch["signal_lengths"][:1])["params"]
    tx = create_optimizer(create_lrs(1e-4, 1000, warmup_steps=10))
    state = TrainState.create(params, tx)
    grad_fn, update_fn, _ = make_ctc_steps(model, tx, clip=25.0)
    step = grad_fn.train_step  # fused grad+update (driver grad_accum=1 path)

    keys = list(jax.random.split(jax.random.PRNGKey(3), n_steps + 1))

    _note(f"ctc freeze={freeze}: build + compile")
    state, loss, _, _ = step(state, batch, keys[-1], freeze=freeze)
    np.asarray(loss)  # compile + host sync through the async relay
    _note("ctc: compiled, timing")

    start = time.perf_counter()
    for i in range(n_steps):
        state, loss, _, _ = step(state, batch, keys[i], freeze=freeze)
    np.asarray(loss)
    elapsed = time.perf_counter() - start

    return (b * t / SAMPLE_RATE) * n_steps / elapsed / jax.device_count()


def bench_transducer(n_steps: int = 20, *, b: int = 16,
                     t: int = 41_359) -> float:
    """RNN-T fine-tune step (train_transducer.py workload, beyond the
    reference): wav2vec2-base encoder + 2-layer LSTM predictor +
    additive joint on the same lane-aligned 16 x 41,359-sample batch as
    the CTC bench; the lattice loss is the associative-scan recursion
    of ops/transducer.py."""
    from audio8_tpu.config import TransducerConfig
    from audio8_tpu.models.transducer import Transducer
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_transducer_steps
    from audio8_tpu.utils import Offsets

    Offsets.remap_fairseq_ctc()
    cfg = TransducerConfig(vocab_size=32, d_ff=3072, dropout=0.1,
                           timestep_masking=0.5, channel_masking=0.1)
    model = Transducer(config=cfg, dtype=jnp.bfloat16)
    u = 64

    rng = np.random.default_rng(0)
    batch = {
        "signal": jnp.asarray(rng.normal(size=(b, t)).astype(np.float32)),
        "signal_lengths": jnp.full((b,), t, jnp.int32),
        "token_ids": jnp.asarray(rng.integers(4, 32, size=(b, u)), jnp.int32),
        "token_lengths": jnp.full((b,), u, jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["signal"][:1],
                        batch["signal_lengths"][:1],
                        batch["token_ids"][:1])["params"]
    tx = create_optimizer(create_lrs(1e-4, 1000, warmup_steps=10))
    state = TrainState.create(params, tx)
    grad_fn, _, _, _ = make_transducer_steps(model, tx, clip=25.0)
    step = grad_fn.train_step

    keys = list(jax.random.split(jax.random.PRNGKey(3), n_steps + 1))
    _note("transducer: build + compile")
    state, loss, _, _ = step(state, batch, keys[-1], freeze=False)
    np.asarray(loss)
    _note("transducer: compiled, timing")

    start = time.perf_counter()
    for i in range(n_steps):
        state, loss, _, _ = step(state, batch, keys[i], freeze=False)
    np.asarray(loss)
    elapsed = time.perf_counter() - start
    return (b * t / SAMPLE_RATE) * n_steps / elapsed / jax.device_count()


def bench_hubert(n_steps: int = 20, *, b: int = 8, t: int = 163_920,
                 num_clusters: int = 100) -> float:
    """HuBERT masked-prediction pretraining step (pretrain_hubert.py
    workload): wav2vec2-base dims + 100-cluster targets on the same
    lane-aligned 8 x 163,920 shape (T'=512) as the pretrain headline."""
    from audio8_tpu.config import CONV_FEATURES, HubertPretrainConfig, conv_output_length
    from audio8_tpu.models.hubert import HubertPretrainModel
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_hubert_steps

    cfg = HubertPretrainConfig(num_clusters=num_clusters, d_ff=3072)
    model = HubertPretrainModel(config=cfg, dtype=jnp.bfloat16)
    tp = conv_output_length(t, CONV_FEATURES[16])

    rng = np.random.default_rng(0)
    batch = {
        "signal": jnp.asarray(rng.normal(size=(b, t)).astype(np.float32)),
        "signal_lengths": jnp.full((b,), t, jnp.int32),
        "token_ids": jnp.asarray(
            rng.integers(0, num_clusters, size=(b, tp)), jnp.int32),
        "token_lengths": jnp.full((b,), tp, jnp.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        batch["signal"][:1], batch["signal_lengths"][:1])["params"]
    tx = create_optimizer(create_lrs(5e-4, 1000, warmup_steps=10))
    state = TrainState.create(params, tx)
    train_step, _ = make_hubert_steps(model, tx, clip=1.0)

    keys = list(jax.random.split(jax.random.PRNGKey(3), n_steps + 1))
    _note("hubert: build + compile")
    state, metrics = train_step(state, batch, keys[-1])
    np.asarray(metrics["loss"])
    _note("hubert: compiled, timing")

    start = time.perf_counter()
    for i in range(n_steps):
        state, metrics = train_step(state, batch, keys[i])
    np.asarray(metrics["loss"])
    elapsed = time.perf_counter() - start
    return (b * t / SAMPLE_RATE) * n_steps / elapsed / jax.device_count()


def bench_seq2seq(n_steps: int = 30) -> float:
    """Seq2seq ASR fine-tune step (train_seq2seq.py workload):
    wav2vec2-base encoder + 2L/4H decoder, teacher forcing, bf16,
    16 x 41,359 samples (T'=128, lane-aligned) = 41.4 audio-sec/step."""
    from audio8_tpu.models.seq2seq import create_seq2seq_model
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_seq2seq_steps
    from audio8_tpu.utils import Offsets

    Offsets.remap_fairseq_ctc()
    model = create_seq2seq_model(vocab_size=32, d_ff=3072, dropout=0.1,
                                 dtype=jnp.bfloat16)
    b, t, u = 16, 41_359, 64  # T'=128 exactly (lane-aligned pipeline shape)

    rng = np.random.default_rng(0)
    batch = {
        "signal": jnp.asarray(rng.normal(size=(b, t)).astype(np.float32)),
        "signal_lengths": jnp.full((b,), t, jnp.int32),
        "token_ids": jnp.asarray(rng.integers(4, 32, size=(b, u)), jnp.int32),
        "token_lengths": jnp.full((b,), u, jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["signal"][:1],
                        batch["signal_lengths"][:1], batch["token_ids"][:1, :-1],
                        batch["token_lengths"][:1] - 1)["params"]
    tx = create_optimizer(create_lrs(1e-4, 1000, warmup_steps=10))
    state = TrainState.create(params, tx)
    grad_fn, update_fn, _, _ = make_seq2seq_steps(model, tx, clip=25.0)

    keys = list(jax.random.split(jax.random.PRNGKey(3), n_steps + 1))
    _note("seq2seq: build + compile")
    loss, grads, bsz, _ = grad_fn(state.params, batch, keys[-1], freeze=False)
    state, _ = update_fn(state, grads, bsz)
    np.asarray(loss)
    _note("seq2seq: compiled, timing")

    start = time.perf_counter()
    for i in range(n_steps):
        loss, grads, bsz, _ = grad_fn(state.params, batch, keys[i], freeze=False)
        state, _ = update_fn(state, grads, bsz)
    np.asarray(loss)
    elapsed = time.perf_counter() - start
    return (b * t / SAMPLE_RATE) * n_steps / elapsed / jax.device_count()


def bench_decode(n_steps: int = 50) -> float:
    """Serving workload: batched greedy-CTC inference RTFx (audio-sec of
    input decoded per wall-clock second per chip). Uses the same eval path
    as cli/test.py: full acoustic forward + per-frame argmax on device."""
    from audio8_tpu.config import AcousticConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
    from audio8_tpu.train.optim import create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_ctc_steps
    from audio8_tpu.utils import Offsets

    Offsets.remap_fairseq_ctc()
    cfg = AcousticConfig(num_labels=32, d_ff=3072, dropout=0.0,
                         timestep_masking=0.0, channel_masking=0.0)
    model = Wav2Vec2AcousticModel(config=cfg, dtype=jnp.bfloat16)
    b, t, u = 16, 41_359, 64  # T'=128 exactly (lane-aligned pipeline shape)

    rng = np.random.default_rng(0)
    batch = {
        "signal": jnp.asarray(rng.normal(size=(b, t)).astype(np.float32)),
        "signal_lengths": jnp.full((b,), t, jnp.int32),
        "token_ids": jnp.asarray(rng.integers(4, 32, size=(b, u)), jnp.int32),
        "token_lengths": jnp.full((b,), u, jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["signal"][:1],
                        batch["signal_lengths"][:1])["params"]
    tx = create_optimizer(create_lrs(1e-4, 10, warmup_steps=1))
    _, _, eval_fn = make_ctc_steps(model, tx)

    _note("decode: build + compile")
    loss, frames, frame_lengths = eval_fn(params, batch)
    np.asarray(loss)  # compile + host sync
    _note("decode: compiled, timing")

    start = time.perf_counter()
    for _ in range(n_steps):
        loss, frames, frame_lengths = eval_fn(params, batch)
    np.asarray(loss)
    elapsed = time.perf_counter() - start
    return (b * t / SAMPLE_RATE) * n_steps / elapsed / jax.device_count()


def bench_chunked_decode(n_passes: int = 4, *, minutes: float = 8.0,
                         batch: int = 4) -> float:
    """Streaming/long-audio serving workload (a8t-serve /
    ChunkedTranscriber): stitched-log-prob RTFx for one long waveform
    decoded through the production chunked path — lane-aligned 30 s
    windows (cli/serve.py defaults: chunk 480,000 -> lane_aligned_chunk,
    context 2 s, batch 4), host-side exact stitching, greedy argmax.
    Generalizes the reference's decode harness
    (/root/reference/audio8/test.py:26-47) to unbounded audio."""
    from audio8_tpu.config import (CONV_FEATURES, AcousticConfig,
                                   lane_aligned_chunk)
    from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
    from audio8_tpu.serve import ChunkedTranscriber
    from audio8_tpu.utils import Offsets

    Offsets.remap_fairseq_ctc()
    cfg = AcousticConfig(num_labels=32, d_ff=3072, dropout=0.0,
                         timestep_masking=0.0, channel_masking=0.0)
    model = Wav2Vec2AcousticModel(config=cfg, dtype=jnp.bfloat16)
    chunk = lane_aligned_chunk(480_000, CONV_FEATURES[16])  # T'=1536

    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.normal(size=(1, 16000)).astype(np.float32)),
        jnp.full((1,), 16000, jnp.int32))["params"]
    params = jax.device_put(params)

    # params as a jit argument, mirroring cli/transcribe.load_acoustic
    # (closed-over params overflow the remote-compile relay at real sizes)
    @jax.jit
    def _forward(p, signal, lengths):
        lp, mask = model.apply({"params": p}, signal, lengths)
        return lp, jnp.sum(mask, axis=-1)

    def forward(signal, lengths):
        return _forward(params, signal, lengths)

    ct = ChunkedTranscriber(forward, CONV_FEATURES[16],
                            chunk_samples=chunk, context_samples=32_000,
                            batch_size=batch)
    wav = rng.normal(size=(int(minutes * 60 * SAMPLE_RATE),)) \
        .astype(np.float32)

    _note(f"chunked_decode: build + compile (chunk={chunk})")
    lp = ct.log_probs(wav)  # compile + one full stitched pass
    np.argmax(lp, axis=-1)
    _note("chunked_decode: compiled, timing")

    start = time.perf_counter()
    for _ in range(n_passes):
        lp = ct.log_probs(wav)
        np.argmax(lp, axis=-1)  # greedy frames (host, as in serve)
    elapsed = time.perf_counter() - start
    return (len(wav) / SAMPLE_RATE) * n_passes / elapsed / jax.device_count()


def _extra_workloads() -> dict:
    """The 'all'-mode extras registry: metric key -> zero-arg callable.
    Looked up from module globals at CALL time so test monkeypatching of
    the bench_* functions takes effect; every key here must have an
    _EXTRA_COSTS entry (tests/test_bench_rotation.py pins that)."""
    return {
        # pretrain_long_clip: the round-1..3 headline point
        # (8 x 163,920, T'=512), kept for cross-round continuity
        # after the round-4 headline geometry change (see
        # bench_pretrain comment / docs/PERF.md "Batch geometry")
        "pretrain_long_clip_throughput":
            lambda: bench_pretrain(b=8, t=163_920),
        "ctc_finetune_throughput": lambda: bench_ctc(False),
        "ctc_finetune_frozen_throughput": lambda: bench_ctc(True),
        "greedy_decode_rtfx": bench_decode,
        "seq2seq_finetune_throughput": bench_seq2seq,
        "hubert_pretrain_throughput": bench_hubert,
        "transducer_finetune_throughput": bench_transducer,
        "large_pretrain_throughput": bench_pretrain_large,
        "chunked_decode_rtfx": bench_chunked_decode,
    }


def _single(metric: str, value: float, extra: dict) -> None:
    print(json.dumps({
        "metric": metric, "value": value, "unit": "audio-sec/sec/chip",
        "vs_baseline": None, "extra_metrics": extra,
    }), flush=True)


# Measured cold compile+run cost per extra workload through the TPU
# relay (round-3 bench stderr timeline updated with round-5 standalone
# runs: transducer 231 s, large ~350 s end-to-end in their own
# processes — the old 440/700 s estimates dated from a slow-relay day
# and starved both workloads through two rounds). An extra only starts
# if the remaining budget covers its estimate — a slow compile
# mid-workload can no longer blow past the budget (the round-3 failure:
# transducer's 381 s compile + LARGE starting at +1221 s ran straight
# into the driver's ~1300-1500 s kill window).
_EXTRA_COSTS = {
    "pretrain_long_clip_throughput": 110.0,
    "ctc_finetune_throughput": 140.0,
    "ctc_finetune_frozen_throughput": 110.0,
    "greedy_decode_rtfx": 90.0,
    "seq2seq_finetune_throughput": 170.0,
    "hubert_pretrain_throughput": 140.0,
    "transducer_finetune_throughput": 260.0,
    "large_pretrain_throughput": 420.0,
    "chunked_decode_rtfx": 220.0,
}


# A metric introduced in round N can only be stale since N - 1: without
# this floor a brand-new metric would jump the rotation queue ahead of
# extras that were genuinely starved for several rounds.
_INTRODUCED = {"chunked_decode_rtfx": 5}


def _last_certified() -> dict:
    """Rotation policy (VERDICT r4 #1): the last round each extra
    appeared as a NUMBER in an official BENCH_r*.json artifact in the
    cwd. Extras run in ascending order of that round (never-certified
    first, cheapest first within a tie), so every workload gets an
    official number at least every other round instead of the fixed
    order starving the expensive tail."""
    import glob
    import re

    last = {}
    for path in sorted(glob.glob("BENCH_r[0-9]*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                parsed = json.load(f).get("parsed") or {}
        except Exception:
            continue
        for k, v in (parsed.get("extra_metrics") or {}).items():
            if isinstance(v, (int, float)):
                last[k] = max(last.get(k, -1), rnd)
    for k, introduced in _INTRODUCED.items():
        last[k] = max(last.get(k, -1), introduced - 1)
    return last


def _emit(throughput: float, extra: dict) -> None:
    """Print the headline JSON line (stdout). Called immediately after the
    headline is measured and again after every completed extra: a driver
    kill at ANY later point leaves a complete, parseable line on stdout
    (the round-3 artifact was lost because the only print sat after all
    extras — VERDICT.md round 3, weak #1). The driver takes the last
    complete line, so each re-emit only ever adds information."""
    print(json.dumps({
        "metric": "wav2vec2_base_pretrain_throughput",
        "value": round(throughput, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(throughput / A100_BASELINE_AUDIO_SEC_PER_SEC, 3),
        "extra_metrics": dict(extra),
    }), flush=True)


def _check_neg_lookup() -> None:
    """Fail loudly if the InfoNCE negative-lookup hot path silently flipped
    off the one-hot formulation on TPU hardware (a ~10% regression nothing
    else would flag — models/wav2vec2.py:_default_neg_lookup)."""
    from audio8_tpu.models.wav2vec2 import _default_neg_lookup
    mode = _default_neg_lookup()
    dev = jax.devices()[0]
    _note(f"neg_lookup mode: {mode} (platform={dev.platform}, "
          f"device_kind={dev.device_kind})")
    if "tpu" in f"{dev.platform} {dev.device_kind}".lower():
        assert mode == "onehot", (
            f"neg_lookup={mode!r} on TPU hardware — the serialized gather "
            "path costs ~10%; unset A8T_NEG_LOOKUP or fix "
            "_default_neg_lookup device sniffing")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload",
                    choices=["pretrain", "large", "ctc", "seq2seq", "decode",
                             "hubert", "transducer", "chunked", "all"],
                    default="all")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("A8T_BENCH_BUDGET", 1200)),
                    help="total wall-clock budget (s); extras in 'all' mode "
                         "only start when the remaining budget covers their "
                         "measured cold cost. The pretrain headline always "
                         "runs and its JSON line prints the moment it is "
                         "measured")
    args = ap.parse_args()
    _setup_compile_cache()
    _check_neg_lookup()

    if args.workload == "large":
        _single("wav2vec2_large_pretrain_throughput",
                round(bench_pretrain_large(), 2), {})
        return
    if args.workload == "seq2seq":
        _single("wav2vec2_base_seq2seq_finetune_throughput",
                round(bench_seq2seq(), 2), {})
        return
    if args.workload == "decode":
        _single("wav2vec2_base_greedy_decode_rtfx",
                round(bench_decode(), 2), {})
        return
    if args.workload == "hubert":
        _single("hubert_base_pretrain_throughput",
                round(bench_hubert(), 2), {})
        return
    if args.workload == "transducer":
        _single("wav2vec2_base_transducer_finetune_throughput",
                round(bench_transducer(), 2), {})
        return
    if args.workload == "chunked":
        _single("wav2vec2_base_chunked_decode_rtfx",
                round(bench_chunked_decode(), 2), {})
        return
    if args.workload == "ctc":
        v = round(bench_ctc(False), 2)
        _single("wav2vec2_base_ctc_finetune_throughput", v,
                {"ctc_finetune_frozen_throughput": round(bench_ctc(True), 2),
                 "ctc_finetune_throughput": v,
                 "ctc_unit": "audio-sec/sec/chip"})
        return

    # 'all'/'pretrain': the headline runs FIRST and its JSON line prints
    # the moment it exists — a driver timeout anywhere in the extras can
    # only lose extras, never the headline. Extras run in STALENESS
    # rotation order (least-recently-certified first — often the most
    # expensive ones, since those are what the old fixed order starved)
    # under a cost-gated budget; each completion re-emits the (now
    # richer) line, and any failure is recorded, not fatal.
    start = time.perf_counter()
    throughput = bench_pretrain()
    extra = {}
    _emit(throughput, extra)  # the headline is now on stdout, kill-proof
    if args.workload == "all":
        # Gate scale starts at 1.0: _EXTRA_COSTS are calibrated from
        # round-5 standalone cold runs, and the headline's wall-clock is
        # a poor predictor of the extras (r5 validation run: a 430 s
        # cold-relay headline seeded the old heuristic to 1.7x while
        # transducer then ran at 1.04x its base — the inflated estimate
        # skipped large even though the remaining budget in fact covered
        # it). The headline is already emitted by this point, so an
        # optimistic estimate risks only the in-flight extra, while a
        # pessimistic one silently starves the queue — the exact failure
        # this rotation exists to prevent. Completed extras adapt the
        # scale in both directions below.
        warm_ratio = 1.0
        fns = _extra_workloads()
        last = _last_certified()
        order = sorted(fns, key=lambda k: (last.get(k, -1),
                                           _EXTRA_COSTS[k]))
        _note("extras rotation order: " + ", ".join(
            f"{k}(r{last.get(k, -1)})" for k in order))
        for key in order:
            fn = fns[key]
            remaining = args.budget - (time.perf_counter() - start)
            est = _EXTRA_COSTS[key] * warm_ratio
            if remaining < est:
                extra[key] = "skipped:budget"
                _note(f"{key}: skipped (need ~{est:.0f}s, "
                      f"{remaining:.0f}s left)")
                continue
            t0 = time.perf_counter()
            try:
                extra[key] = round(fn(), 2)
                actual = time.perf_counter() - t0
                ratio = actual / _EXTRA_COSTS[key]
                if ratio > warm_ratio:
                    # slower than believed (cold relay): adapt UP so the
                    # next gate doesn't start something it can't afford
                    warm_ratio = ratio
                else:
                    # warm evidence shrinks the gate, bounded (x1.2
                    # margin, floor 0.8): the base costs are calibrated
                    # cold-run numbers, so a mild margin suffices, and
                    # the floor keeps one cache-hit fluke from halving
                    # every later estimate (worst case: est = 0.8x cost,
                    # a fully cold extra overshoots the budget by at
                    # most a quarter of its own cost — well inside the
                    # driver kill window, and only the in-flight extra
                    # is at stake once the headline is out)
                    warm_ratio = max(min(warm_ratio, ratio * 1.2), 0.8)
            except Exception as e:  # record, keep the headline alive
                extra[key] = f"error:{type(e).__name__}"
            _emit(throughput, extra)
        if any(isinstance(extra.get(k), (int, float)) for k in
               ("ctc_finetune_throughput", "ctc_finetune_frozen_throughput")):
            extra["ctc_unit"] = "audio-sec/sec/chip"

    _emit(throughput, extra)


if __name__ == "__main__":
    main()
