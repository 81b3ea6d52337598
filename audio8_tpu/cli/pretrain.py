"""Contrastive pretraining driver.

Equivalent of /root/reference/audio8/pretrain.py: wav2vec2 self-supervised
pretraining with Gumbel VQ + InfoNCE + diversity loss over dense
min-cropped (optionally bucketed) batches, AdamW + warmup/cosine LR,
checkpoints every steps_per_checkpoint and validation every 10x that.
Unlike the reference (which never calls set_num_updates — SURVEY.md
quirks), the Gumbel temperature anneals with the global step.
"""
from __future__ import annotations

import logging
import os
import time
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from audio8_tpu.cli.common import (add_common_model_args, apply_preset,
                                   moe_kwargs, resolve_restart, setup,
                                   setup_parallelism, topology_kwargs)
from audio8_tpu.config import CONV_FEATURES, PretrainConfig, lane_aligned_grid
from audio8_tpu.data.datasets import AudioFileDataset, BucketingAudioDataset, PrefetchLoader
from audio8_tpu.models.wav2vec2 import Wav2Vec2Model
from audio8_tpu.parallel.sharding import put_batch, shard_state
from audio8_tpu.train.checkpoint import save_checkpoint
from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
from audio8_tpu.train.preempt import PreemptionGuard
from audio8_tpu.train.steps import make_pretrain_steps
from audio8_tpu.utils import Average, str2bool

logger = logging.getLogger("audio8_tpu.pretrain")

DEFAULT_BUCKETS = [11111, 35714, 38461, 41666, 45454, 50000, 55555, 62500,
                   71428, 83333, 100000, 125000, 166666, 250000]


def parse_args(argv=None):
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--basedir", type=str)
    parser.add_argument("--manifest_dir", required=True)
    parser.add_argument("--train_manifest_file", default="train.tsv")
    parser.add_argument("--valid_manifest_file", default="valid.tsv")
    parser.add_argument("--dataset_key", default="ls")
    parser.add_argument("--num_vq_vars", type=int, default=320)
    parser.add_argument("--num_vq_groups", type=int, default=2)
    parser.add_argument("--final_dim", type=int, default=None,
                        help="VQ/contrastive projection width (768 for "
                             "the large preset)")
    parser.add_argument("--num_train_workers", type=int, default=4)
    parser.add_argument("--tokens_per_batch", type=int, default=1_400_000)
    parser.add_argument("--max_sample_len", type=int, default=325_000)
    parser.add_argument("--lr_scheduler", default="cosine")
    parser.add_argument("--lr_alpha", type=float, default=0.0)
    parser.add_argument("--optim", default="adamw")
    parser.add_argument("--lr", type=float, default=2.0e-4)
    parser.add_argument("--clip", type=float, default=1.0)
    parser.add_argument("--weight_decay", type=float, default=1.0e-2)
    parser.add_argument("--bucketing", type=str2bool, default=False)
    parser.add_argument("--buckets", type=int, nargs="+", default=DEFAULT_BUCKETS)
    parser.add_argument("--lane_align", type=str2bool, default=True,
                        help="snap bucket lengths down so the conv stack's "
                             "T' lands on the 128-wide MXU tile (skips "
                             "entries where that would crop >10%% of the "
                             "frames); measured +7%% pretrain throughput "
                             "at T'=512 vs T'=546 on v5e")
    parser.add_argument("--train_steps", type=int, default=400_000)
    parser.add_argument("--valid_steps", type=int, default=10_000)
    parser.add_argument("--restart_from", type=str)
    parser.add_argument("--warmup_steps", type=int, default=10000)
    parser.add_argument("--plateau_steps", type=int, default=0)
    parser.add_argument("--steps_per_checkpoint", type=int, default=1000)
    parser.add_argument("--distributed", type=str2bool, default=False)
    parser.add_argument("--n_negatives", type=int, default=100)
    parser.add_argument("--profile_dir", type=str,
                        help="capture a jax.profiler trace window here")
    add_common_model_args(parser)
    args = apply_preset(parser.parse_args(argv))
    sr_khz = args.target_sample_rate // 1000
    if args.lane_align and sr_khz in CONV_FEATURES:
        args.buckets = lane_aligned_grid(args.buckets, CONV_FEATURES[sr_khz])
    return args


def train(argv=None):
    args = parse_args(argv)
    if args.basedir is None:
        args.basedir = f"wav2vec2-{args.dataset_key}-{os.getpid()}"
    os.makedirs(args.basedir, exist_ok=True)
    rank, world = setup(args.distributed)
    preempt = PreemptionGuard()  # catch SIGTERM from here on
    mesh, rules, batch_multiple, row_shard = setup_parallelism(args.tensor_parallel)

    train_manifest = os.path.join(args.manifest_dir, args.train_manifest_file)
    valid_manifest = os.path.join(args.manifest_dir, args.valid_manifest_file)
    common = dict(shard_index=rank, num_shards=world,
                  batch_multiple=batch_multiple, row_shard=row_shard)
    vcommon = common if row_shard else dict(batch_multiple=batch_multiple)
    if args.bucketing:
        train_set = BucketingAudioDataset(
            args.buckets, train_manifest, args.max_sample_len,
            args.tokens_per_batch, **common)
        valid_set = BucketingAudioDataset(
            args.buckets, valid_manifest, args.max_sample_len,
            args.tokens_per_batch, **vcommon)
    else:
        train_set = AudioFileDataset(
            train_manifest, args.max_sample_len, args.tokens_per_batch,
            length_grid=args.buckets, **common)
        valid_set = AudioFileDataset(
            valid_manifest, args.max_sample_len, args.tokens_per_batch,
            length_grid=args.buckets, **vcommon)
    logger.info("Loaded datasets")

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg = PretrainConfig(
        sample_rate=args.target_sample_rate // 1000,
        num_vq_vars=args.num_vq_vars, num_vq_groups=args.num_vq_groups,
        final_dim=args.final_dim,
        d_model=args.d_model, num_heads=args.num_heads,
        num_layers=args.num_layers, d_ff=args.d_ff, dropout=args.dropout,
        attention_dropout=args.attention_dropout,
        remat=args.remat, **topology_kwargs(args),
        sequence_parallel=args.sequence_parallel, **moe_kwargs(args),
        layer_drop=args.layer_drop, n_negatives=args.n_negatives)
    model = Wav2Vec2Model(config=cfg, dtype=dtype)

    lr_sched = create_lrs(args.lr, args.train_steps, args.lr_scheduler,
                          alpha=args.lr_alpha, warmup_steps=args.warmup_steps,
                          plateau_steps=args.plateau_steps)
    tx = create_optimizer(lr_sched, args.optim, args.weight_decay)

    example = jnp.zeros((2, min(args.max_sample_len, 48_000)), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    init_params = model.init(rngs, example, train=True)["params"]
    template = TrainState.create(init_params, tx)
    params, state, global_step = resolve_restart(
        args.restart_from, init_params, template, ctc=False,
        num_layers=args.num_layers, sr=args.target_sample_rate // 1000, **topology_kwargs(args))
    if state is None:
        state = TrainState.create(params, tx, step=global_step)
    state = shard_state(state, mesh, rules, zero1=args.zero1, fsdp=args.fsdp)
    n_params = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(state.params))
    logger.info("Model has %s parameters", f"{int(n_params):,}")

    train_step, eval_step = make_pretrain_steps(
        model, tx, clip=args.clip, n_negatives=args.n_negatives, mesh=mesh)

    from audio8_tpu.train.profiler import StepProfiler
    profiler = StepProfiler(args.profile_dir)

    update_on = args.steps_per_checkpoint
    validate_on = update_on * 10
    report_on = max(10, update_on) // 10
    model_base = os.path.join(args.basedir, "checkpoint")

    train_itr = iter(PrefetchLoader(train_set, num_workers=args.num_train_workers, prefetch=4))
    avg_loss = Average("average_train_loss")
    step_time = Average("average_step_time")
    start_of_run = time.time()
    # identical on all processes: one global mesh computation (see train.py)
    rng = jax.random.PRNGKey(99)

    steps = int(state.step)  # python-side mirror: avoid a device sync/iter
    while steps < args.train_steps:
        start = time.time()
        batch = put_batch({"signal": next(train_itr)}, mesh)["signal"]
        rng, sub = jax.random.split(rng)
        state, metrics = train_step(state, batch, sub)
        steps += 1
        profiler.step(steps)
        if steps % 8 == 0:  # subsample the loss fetch (host sync)
            avg_loss.update(float(metrics["loss"]), n=8)
        step_time.update(time.time() - start)

        if (steps + 1) % report_on == 0 and step_time.avg:
            logger.info("%s, steps/min %.2f, LR %.6f, temp %.4f, ppl %.1f, acc %.3f",
                        avg_loss, 60.0 / step_time.avg,
                        float(state.current_lr or -1),
                        float(metrics["temperature"]),
                        float(metrics["code_perplexity"]),
                        float(metrics["accuracy"]))
        if (steps + 1) % update_on == 0:
            # collective: orbax synchronizes processes inside save
            save_checkpoint(state, model_base, steps, tick_type="step")
        if preempt.should_save(steps):
            save_checkpoint(state, model_base, steps, tick_type="step")
            if rank == 0:
                logger.warning("preempted: saved step %d, exiting", steps)
            break
        if (steps + 1) % validate_on == 0:
            # all processes participate (mesh computation); rank 0 logs
            m = {"train_elapsed_min": (time.time() - start_of_run) / 60,
                 "average_train_loss": avg_loss.avg}
            avg_valid = Average("average_valid_loss")
            vstart = time.time()
            valid_itr = iter(valid_set)
            for j in range(args.valid_steps):
                try:
                    vb = put_batch({"signal": next(valid_itr)}, mesh)["signal"]
                except StopIteration:
                    break
                rng, sub = jax.random.split(rng)
                loss, _ = eval_step(state.params, vb, sub, state.step)
                avg_valid.update(float(loss))
            m["average_valid_loss"] = avg_valid.avg
            m["valid_elapsed_epoch"] = (time.time() - vstart) / 60
            if rank == 0:
                logger.info(m)
    return state


def main():
    train()


if __name__ == "__main__":
    main()
