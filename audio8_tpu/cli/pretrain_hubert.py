"""HuBERT masked-prediction pretraining driver (arXiv 2106.07447).

A fifth training workload beyond the reference's four: the encoder
predicts offline k-means cluster ids (``a8t-cluster-targets`` writes the
``.km`` files) at masked frames. Rides the supervised data pipeline
(TSV manifest + sibling ``.km``, same batching/sharding/lane-alignment
as CTC training) and the mesh/TrainState machinery of the other
drivers. Loss/metrics: masked cross-entropy + masked accuracy
(train/steps.make_hubert_steps).
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
from audio8_tpu.config import HubertPretrainConfig
from audio8_tpu.data.datasets import AudioTextLetterDataset, PrefetchLoader
from audio8_tpu.models.hubert import HubertPretrainModel
from audio8_tpu.parallel.sharding import put_batch, shard_state
from audio8_tpu.train.checkpoint import save_checkpoint
from audio8_tpu.train.preempt import PreemptionGuard
from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
from audio8_tpu.train.steps import make_hubert_steps
from audio8_tpu.utils import Average, str2bool

logger = logging.getLogger("audio8_tpu.pretrain_hubert")


def parse_args(argv=None):
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--basedir", type=str)
    parser.add_argument("--root_dir")
    parser.add_argument("--train_dataset", type=str,
                        help="TSV manifest; targets come from the sibling "
                             ".km file (a8t-cluster-targets)")
    parser.add_argument("--valid_dataset", type=str)
    parser.add_argument("--dataset_key", default="LibriSpeech")
    parser.add_argument("--num_clusters", type=int, default=100)
    parser.add_argument("--final_dim", type=int, default=256)
    parser.add_argument("--logit_temp", type=float, default=0.1)
    parser.add_argument("--pred_masked_weight", type=float, default=1.0)
    parser.add_argument("--pred_unmasked_weight", type=float, default=0.0)
    parser.add_argument("--num_train_workers", type=int, default=4)
    parser.add_argument("--max_sample_len", type=int, default=325_000)
    parser.add_argument("--lr_scheduler", default="cosine")
    parser.add_argument("--lr_alpha", type=float, default=0.0)
    parser.add_argument("--optim", default="adamw")
    parser.add_argument("--lr", type=float, default=5.0e-4)
    parser.add_argument("--clip", type=float, default=1.0)
    parser.add_argument("--weight_decay", type=float, default=0.01)
    parser.add_argument("--restart_tt", choices=["step", "ignore"])
    parser.add_argument("--restart_from", type=str)
    parser.add_argument("--warmup_steps", type=int, default=32_000)
    parser.add_argument("--plateau_steps", type=int, default=0)
    parser.add_argument("--timestep_masking", type=float, default=0.80)
    parser.add_argument("--timestep_mask_len", type=int, default=10)
    parser.add_argument("--train_steps", type=int, default=250_000)
    parser.add_argument("--valid_steps", type=int, default=100)
    parser.add_argument("--steps_per_checkpoint", type=int, default=2400)
    parser.add_argument("--distributed", type=str2bool, default=False)
    parser.add_argument("--target_tokens_per_batch", type=int,
                        default=1_400_000)
    parser.add_argument("--pad_to_multiple", type=int, default=16_000)
    parser.add_argument("--lane_align", type=str2bool, default=True)
    parser.add_argument("--length_buckets", type=int, nargs="*")
    add_common_model_args(parser)
    return apply_preset(parser.parse_args(argv))


def make_dataset(args, tsv, rank, world, batch_multiple, row_shard,
                 shuffle=True, infinite=True):
    return AudioTextLetterDataset(
        os.path.join(args.root_dir, tsv), None,
        args.target_tokens_per_batch, args.max_sample_len,
        input_sample_rate=args.input_sample_rate,
        target_sample_rate=args.target_sample_rate,
        shuffle=shuffle, is_infinite=infinite,
        tgt_type=AudioTextLetterDataset.TGT_KM,
        max_dst_length=2048,  # frames at 50 Hz; >= max_sample_len / 320
        shard_index=rank if (row_shard or infinite) else 0,
        num_shards=world if (row_shard or infinite) else 1,
        batch_multiple=batch_multiple, row_shard=row_shard,
        pad_to_multiple=args.pad_to_multiple,
        length_grid=args.length_buckets,
        lane_align=args.lane_align)


def train(argv=None):
    args = parse_args(argv)
    if args.basedir is None:
        args.basedir = f"hubert-{args.dataset_key}-{os.getpid()}"
    os.makedirs(args.basedir, exist_ok=True)

    rank, world = setup(args.distributed)
    preempt = PreemptionGuard()  # catch SIGTERM from here on
    mesh, rules, batch_multiple, row_shard = setup_parallelism(args.tensor_parallel)

    train_set = make_dataset(args, args.train_dataset, rank, world,
                             batch_multiple, row_shard)
    valid_set = make_dataset(args, args.valid_dataset, rank, world,
                             batch_multiple, row_shard,
                             shuffle=False, infinite=False)
    logger.info("Loaded datasets")

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg = HubertPretrainConfig(
        num_clusters=args.num_clusters, final_dim=args.final_dim,
        logit_temp=args.logit_temp,
        pred_masked_weight=args.pred_masked_weight,
        pred_unmasked_weight=args.pred_unmasked_weight,
        sample_rate=args.target_sample_rate // 1000,
        d_model=args.d_model, num_heads=args.num_heads,
        num_layers=args.num_layers, d_ff=args.d_ff, dropout=args.dropout,
        attention_dropout=args.attention_dropout,
        remat=args.remat, **topology_kwargs(args), **moe_kwargs(args),
        timestep_masking=args.timestep_masking,
        timestep_mask_len=args.timestep_mask_len,
        layer_drop=args.layer_drop, freeze_fx=False)
    model = HubertPretrainModel(config=cfg, dtype=dtype)

    lr_sched = create_lrs(args.lr, args.train_steps, args.lr_scheduler,
                          alpha=args.lr_alpha, warmup_steps=args.warmup_steps,
                          plateau_steps=args.plateau_steps)
    tx = create_optimizer(lr_sched, args.optim, args.weight_decay)

    example = jnp.zeros((1, args.pad_to_multiple), jnp.float32)
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
    n_params = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(state.params))
    logger.info("Model has %s parameters", f"{int(n_params):,}")

    train_step, eval_fn = make_hubert_steps(model, tx, clip=args.clip)

    validate_on = min(args.train_steps // 2, args.steps_per_checkpoint)
    report_on = max(10, args.steps_per_checkpoint) // 10
    model_base = os.path.join(args.basedir, "checkpoint")

    train_itr = iter(PrefetchLoader(train_set, num_workers=args.num_train_workers, prefetch=4))
    avg_loss = Average("average_train_loss")
    avg_acc = Average("masked_accuracy")
    step_time = Average("average_step_time")
    rng = jax.random.PRNGKey(1234)
    start = time.time()

    gstep = int(state.step)
    while gstep < args.train_steps:
        try:
            batch = next(train_itr)
            jbatch = put_batch(batch, mesh)
            rng, sub = jax.random.split(rng)
            state, metrics = train_step(state, jbatch, sub)
            gstep += 1
            if gstep % 8 == 0:
                avg_loss.update(float(metrics["loss"]), n=8)
                avg_acc.update(float(metrics["acc_masked"]), n=8)
            step_time.update(time.time() - start)
            start = time.time()

            if gstep % report_on == 0 and step_time.avg:
                sps = 1.0 / step_time.avg
                lr_now = state.current_lr
                logger.info("%s, %s, steps/min %.2f, LR %.6f",
                            avg_loss, avg_acc, sps * 60,
                            float(lr_now) if lr_now is not None else -1)

            if gstep % validate_on == 0:
                vm = validate(eval_fn, state.params, valid_set,
                              args.valid_steps, rng, mesh)
                if rank == 0:
                    logger.info(vm)
                save_checkpoint(state, model_base, gstep, tick_type="step")

            if preempt.should_save(gstep):
                save_checkpoint(state, model_base, gstep, tick_type="step")
                if rank == 0:
                    logger.warning("preempted: saved step %d, exiting", gstep)
                break
        except StopIteration:
            raise
        except Exception as e:
            logger.exception("step failed: %s", e)
    return state


def validate(eval_fn, params, valid_set, valid_steps, rng, mesh):
    avg_loss = Average("average_valid_loss")
    correct = total = 0.0
    t0 = time.time()
    for j, batch in enumerate(iter(valid_set)):
        if j > valid_steps:
            break
        try:
            jbatch = put_batch(batch, mesh)
            loss, metrics = eval_fn(params, jbatch,
                                    jax.random.fold_in(rng, j))
            avg_loss.update(float(loss))
            n = float(metrics["n_masked"])
            correct += float(metrics["acc_masked"]) * n
            total += n
        except Exception as e:
            logger.exception("valid step failed: %s", e)
    from audio8_tpu.parallel.sharding import global_sum_scalars

    correct, total = global_sum_scalars([correct, total])
    return {"average_valid_loss": avg_loss.avg,
            "valid_masked_accuracy": correct / max(total, 1.0),
            "valid_elapsed_epoch": time.time() - t0}


def main():
    train()


if __name__ == "__main__":
    main()
