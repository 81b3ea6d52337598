"""data2vec-audio masked-regression pretraining driver (arXiv 2202.03555).

Sixth training workload: the student regresses an EMA teacher's
instance-normalized top-k layer average at masked frames
(models/data2vec.py) — no quantizer, no negatives, no external targets.
Rides the unsupervised audio pipeline (dense min-cropped or bucketed
batches like a8t-pretrain) and the mesh machinery of the other drivers;
the teacher checkpoint is saved alongside the student so restarts
resume both.

To pretrain the actual data2vec-audio layout, pass
``--preset data2vec-base`` (layer-norm extractor + 5-deep stacked
positional convs); the objective also works on any other encoder
topology in the zoo.
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
from audio8_tpu.config import Data2VecPretrainConfig
from audio8_tpu.data.datasets import AudioFileDataset, PrefetchLoader
from audio8_tpu.models.data2vec import Data2VecAudioModel
from audio8_tpu.parallel.sharding import put_batch, shard_params, shard_state
from audio8_tpu.train.preempt import PreemptionGuard
from audio8_tpu.train.checkpoint import (find_latest_checkpoint,
                                         load_checkpoint, save_checkpoint)
from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
from audio8_tpu.train.steps import make_data2vec_steps
from audio8_tpu.utils import Average, str2bool

logger = logging.getLogger("audio8_tpu.pretrain_data2vec")


def parse_args(argv=None):
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--basedir", type=str)
    parser.add_argument("--manifest_dir", required=True)
    parser.add_argument("--train_manifest_file", default="train.tsv")
    parser.add_argument("--valid_manifest_file", default="valid.tsv")
    parser.add_argument("--dataset_key", default="ls")
    parser.add_argument("--average_top_k_layers", type=int, default=8)
    parser.add_argument("--ema_decay", type=float, default=0.999)
    parser.add_argument("--ema_end_decay", type=float, default=0.9999)
    parser.add_argument("--ema_anneal_steps", type=int, default=30_000)
    parser.add_argument("--num_train_workers", type=int, default=4)
    parser.add_argument("--tokens_per_batch", type=int, default=1_400_000)
    parser.add_argument("--max_sample_len", type=int, default=325_000)
    parser.add_argument("--lr_scheduler", default="cosine")
    parser.add_argument("--lr_alpha", type=float, default=0.0)
    parser.add_argument("--optim", default="adamw")
    parser.add_argument("--lr", type=float, default=5.0e-4)
    parser.add_argument("--clip", type=float, default=1.0)
    parser.add_argument("--weight_decay", type=float, default=1.0e-2)
    parser.add_argument("--buckets", type=int, nargs="*")
    parser.add_argument("--restart_from", type=str)
    parser.add_argument("--restart_tt", choices=["step", "ignore"])
    parser.add_argument("--warmup_steps", type=int, default=10_000)
    parser.add_argument("--plateau_steps", type=int, default=0)
    parser.add_argument("--timestep_masking", type=float, default=0.65)
    parser.add_argument("--timestep_mask_len", type=int, default=10)
    parser.add_argument("--train_steps", type=int, default=400_000)
    parser.add_argument("--valid_steps", type=int, default=10)
    parser.add_argument("--steps_per_checkpoint", type=int, default=1000)
    parser.add_argument("--distributed", type=str2bool, default=False)
    add_common_model_args(parser)
    return apply_preset(parser.parse_args(argv))


def train(argv=None):
    args = parse_args(argv)
    if args.basedir is None:
        args.basedir = f"data2vec-{args.dataset_key}-{os.getpid()}"
    os.makedirs(args.basedir, exist_ok=True)
    rank, world = setup(args.distributed)
    preempt = PreemptionGuard()  # catch SIGTERM from here on
    mesh, rules, batch_multiple, row_shard = setup_parallelism(args.tensor_parallel)

    common = dict(shard_index=rank, num_shards=world,
                  batch_multiple=batch_multiple, row_shard=row_shard)
    train_set = AudioFileDataset(
        os.path.join(args.manifest_dir, args.train_manifest_file),
        args.max_sample_len, args.tokens_per_batch,
        length_grid=args.buckets, **common)
    valid_set = AudioFileDataset(
        os.path.join(args.manifest_dir, args.valid_manifest_file),
        args.max_sample_len, args.tokens_per_batch,
        length_grid=args.buckets,
        **(common if row_shard else dict(batch_multiple=batch_multiple)))
    logger.info("Loaded datasets")

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg = Data2VecPretrainConfig(
        average_top_k_layers=args.average_top_k_layers,
        ema_decay=args.ema_decay, ema_end_decay=args.ema_end_decay,
        ema_anneal_steps=args.ema_anneal_steps,
        sample_rate=args.target_sample_rate // 1000,
        d_model=args.d_model, num_heads=args.num_heads,
        num_layers=args.num_layers, d_ff=args.d_ff, dropout=args.dropout,
        attention_dropout=args.attention_dropout,
        remat=args.remat, **topology_kwargs(args), **moe_kwargs(args),
        timestep_masking=args.timestep_masking,
        timestep_mask_len=args.timestep_mask_len,
        layer_drop=args.layer_drop, freeze_fx=False)
    model = Data2VecAudioModel(config=cfg, dtype=dtype)

    lr_sched = create_lrs(args.lr, args.train_steps, args.lr_scheduler,
                          alpha=args.lr_alpha, warmup_steps=args.warmup_steps,
                          plateau_steps=args.plateau_steps)
    tx = create_optimizer(lr_sched, args.optim, args.weight_decay)

    example = jnp.zeros((2, 48_000), jnp.float32)
    init_params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        example)["params"]
    template = TrainState.create(init_params, tx)
    params, state, global_step = resolve_restart(
        args.restart_from, init_params, template,
        num_layers=args.num_layers, sr=args.target_sample_rate // 1000,
        restart_tt=args.restart_tt, **topology_kwargs(args))
    if state is None:
        state = TrainState.create(params, tx, step=global_step)
    state = shard_state(state, mesh, rules, zero1=args.zero1, fsdp=args.fsdp)

    # teacher: restored from the sibling teacher checkpoint on restart,
    # else initialized as a COPY of the student (the train step donates
    # both trees — aliased buffers would be donated twice)
    teacher = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                     state.params)
    teacher_base = os.path.join(args.basedir, "teacher")
    if args.restart_from:
        try:
            tpath, _ = find_latest_checkpoint(
                args.restart_from if os.path.isdir(args.restart_from)
                else os.path.dirname(args.restart_from), base="teacher")
            teacher = load_checkpoint(tpath, teacher)
            logger.info("restored teacher from %s", tpath)
        except Exception:
            logger.info("no teacher checkpoint found; teacher = student")
    teacher = shard_params(teacher, mesh, rules)
    n_params = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(state.params))
    logger.info("Model has %s parameters (x2 with the EMA teacher)",
                f"{int(n_params):,}")

    train_step, eval_fn = make_data2vec_steps(model, tx, clip=args.clip)

    validate_on = min(args.train_steps // 2, args.steps_per_checkpoint)
    report_on = max(10, args.steps_per_checkpoint) // 10
    model_base = os.path.join(args.basedir, "checkpoint")

    train_itr = iter(PrefetchLoader(train_set, num_workers=args.num_train_workers, prefetch=4))
    avg_loss = Average("average_train_loss")
    target_std = Average("target_std")
    step_time = Average("average_step_time")
    rng = jax.random.PRNGKey(1234)
    start = time.time()

    gstep = int(state.step)
    while gstep < args.train_steps:
        try:
            signal = put_batch({"signal": next(train_itr)}, mesh)["signal"]
            batch = {"signal": signal, "signal_lengths": None}
            rng, sub = jax.random.split(rng)
            state, teacher, metrics = train_step(state, teacher, batch, sub)
            gstep += 1
            if gstep % 8 == 0:
                avg_loss.update(float(metrics["loss"]), n=8)
                target_std.update(float(metrics["target_std"]), n=8)
            step_time.update(time.time() - start)
            start = time.time()

            if gstep % report_on == 0 and step_time.avg:
                lr_now = state.current_lr
                logger.info("%s, %s, steps/min %.2f, LR %.6f, ema %.5f",
                            avg_loss, target_std, 60.0 / step_time.avg,
                            float(lr_now) if lr_now is not None else -1,
                            float(metrics["ema_decay"]))

            if gstep % validate_on == 0:
                vm = validate(eval_fn, state.params, teacher, valid_set,
                              args.valid_steps, rng, mesh)
                if rank == 0:
                    logger.info(vm)
                save_checkpoint(state, model_base, gstep, tick_type="step")
                save_checkpoint(teacher, teacher_base, gstep,
                                tick_type="step")

            if preempt.should_save(gstep):
                save_checkpoint(state, model_base, gstep, tick_type="step")
                save_checkpoint(teacher, teacher_base, gstep,
                                tick_type="step")
                if rank == 0:
                    logger.warning("preempted: saved step %d, exiting", gstep)
                break
        except StopIteration:
            raise
        except Exception as e:
            logger.exception("step failed: %s", e)
    return state, teacher


def validate(eval_fn, params, teacher, valid_set, valid_steps, rng, mesh):
    avg_loss = Average("average_valid_loss")
    t0 = time.time()
    itr = iter(valid_set)
    for j in range(valid_steps):
        try:
            signal = put_batch({"signal": next(itr)}, mesh)["signal"]
            loss, _ = eval_fn(params, teacher,
                              {"signal": signal, "signal_lengths": None},
                              jax.random.fold_in(rng, j))
            avg_loss.update(float(loss))
        except StopIteration:
            break
        except Exception as e:
            logger.exception("valid step failed: %s", e)
    return {"average_valid_loss": avg_loss.avg,
            "valid_elapsed_epoch": time.time() - t0}


def main():
    train()


if __name__ == "__main__":
    main()
