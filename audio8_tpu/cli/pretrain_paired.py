"""Paired audio<->text contrastive (CLIP-style) pretraining driver.

Equivalent of /root/reference/audio8/pretrain_paired.py: pooled wav2vec2
audio tower + transformer-or-BoW text tower trained with a symmetric
InfoNCE loss and learnable temperature; separate unfreeze steps per tower.
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
from audio8_tpu.config import PooledConfig, TextEncoderConfig
from audio8_tpu.data.datasets import AudioTextLetterDataset, PrefetchLoader
from audio8_tpu.models.dual_encoder import DualEncoderModel, SymmetricCLIPLoss
from audio8_tpu.parallel.sharding import put_batch, shard_state
from audio8_tpu.models.text import BPEVectorizer, TextVectorizer, read_vocab_file
from audio8_tpu.train.checkpoint import save_checkpoint
from audio8_tpu.train.preempt import PreemptionGuard
from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
from audio8_tpu.train.steps import accumulate_grads, make_paired_steps
from audio8_tpu.utils import Average, str2bool

logger = logging.getLogger("audio8_tpu.paired")


def parse_args(argv=None):
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--basedir", type=str)
    parser.add_argument("--root_dir")
    parser.add_argument("--train_dataset", type=str)
    parser.add_argument("--valid_dataset", type=str)
    parser.add_argument("--dataset_key", default="LibriSpeech")
    parser.add_argument("--grad_accum", type=int, default=1)
    parser.add_argument("--num_train_workers", type=int, default=4)
    parser.add_argument("--max_sample_len", type=int)
    parser.add_argument("--lr_scheduler", default="cosine")
    parser.add_argument("--lr_alpha", type=float, default=0.0)
    parser.add_argument("--optim", default="adamw")
    parser.add_argument("--lr", type=float, default=2.0e-5)
    parser.add_argument("--clip", type=float, default=25.0)
    parser.add_argument("--weight_decay", type=float, default=1.0e-2)
    parser.add_argument("--restart_from", type=str)
    parser.add_argument("--warmup_steps", type=int, default=10000)
    parser.add_argument("--plateau_steps", type=int, default=0)
    parser.add_argument("--unfreeze_audio_after_step", type=int, default=100_000)
    parser.add_argument("--unfreeze_text_after_step", type=int, default=100_000)
    parser.add_argument("--train_steps", type=int, default=400_000)
    parser.add_argument("--valid_steps", type=int, default=1000)
    parser.add_argument("--steps_per_checkpoint", type=int, default=1000)
    parser.add_argument("--distributed", type=str2bool, default=False)
    parser.add_argument("--target_tokens_per_batch", type=int, default=700_000)
    parser.add_argument("--target_type", choices=["wrd", "bpe"], default="wrd")
    parser.add_argument("--vocab_file")
    parser.add_argument("--dict_file", default="dict.{}.txt")
    parser.add_argument("--subword_model_file")
    parser.add_argument("--subword_vocab_file")
    parser.add_argument("--warmstart_text", type=str,
                        help="npz file to warm-start the text tower "
                             "(load_tlm_npz equivalent)")
    parser.add_argument("--init_temp", type=float, default=1.0)
    parser.add_argument("--learn_temp", type=str2bool, default=True)
    parser.add_argument("--output_dim", type=int, default=256)
    parser.add_argument("--stacking_layers", type=int, nargs="*", default=[])
    # audio tower
    parser.add_argument("--audio_reduction_type", default="max")
    parser.add_argument("--audio_d_k", type=int, default=64)
    # text tower
    parser.add_argument("--text_encoder_type", default="transformer",
                        choices=["transformer", "bow"])
    parser.add_argument("--text_d_model", type=int, default=512)
    parser.add_argument("--text_num_heads", type=int, default=8)
    parser.add_argument("--text_num_layers", type=int, default=8)
    parser.add_argument("--text_d_ff", type=int, default=2048)
    parser.add_argument("--text_rpr_k", type=int, default=8)
    parser.add_argument("--text_reduction_type", default="max")
    parser.add_argument("--text_d_k", type=int, default=64)
    parser.add_argument("--pad_to_multiple", type=int, default=16_000)
    parser.add_argument("--lane_align", type=str2bool, default=True,
                        help="clamp pad targets that would push the conv "
                             "frame count past a 128-lane MXU tile boundary "
                             "the batch didn't require (never drops audio)")
    parser.add_argument("--length_buckets", type=int, nargs="*",
                        help="geometric audio-length grid (samples); pads "
                             "each batch up to the next bucket, bounding "
                             "XLA compile count")
    add_common_model_args(parser)
    return apply_preset(parser.parse_args(argv))


def train(argv=None):
    args = parse_args(argv)
    args.dict_file = args.dict_file.format(args.target_type)
    if args.basedir is None:
        args.basedir = f"paired-{args.dataset_key}-{os.getpid()}"
    os.makedirs(args.basedir, exist_ok=True)
    rank, world = setup(args.distributed)
    preempt = PreemptionGuard()  # catch SIGTERM from here on
    mesh, rules, batch_multiple, row_shard = setup_parallelism(args.tensor_parallel)

    if args.target_type == "bpe" and args.subword_model_file:
        vec = BPEVectorizer(args.subword_model_file, args.subword_vocab_file,
                            ["<s>"], ["</s>"])
        vocab = vec.vocab
    else:
        vocab_file = args.vocab_file or os.path.join(args.root_dir, args.dict_file)
        vocab = read_vocab_file(vocab_file)
        vec = TextVectorizer(vocab)

    train_set = AudioTextLetterDataset(
        os.path.join(args.root_dir, args.train_dataset), vec,
        args.target_tokens_per_batch, args.max_sample_len,
        input_sample_rate=args.input_sample_rate,
        target_sample_rate=args.target_sample_rate,
        shuffle=True, tgt_type=args.target_type,
        shard_index=rank, num_shards=world,
        batch_multiple=batch_multiple, row_shard=row_shard,
        pad_to_multiple=args.pad_to_multiple,
        length_grid=args.length_buckets,
        lane_align=args.lane_align)
    valid_set = AudioTextLetterDataset(
        os.path.join(args.root_dir, args.valid_dataset), vec,
        args.target_tokens_per_batch, args.max_sample_len,
        input_sample_rate=args.input_sample_rate,
        target_sample_rate=args.target_sample_rate,
        shuffle=False, is_infinite=False, tgt_type=args.target_type,
        shard_index=rank if row_shard else 0,
        num_shards=world if row_shard else 1,
        batch_multiple=batch_multiple, row_shard=row_shard,
        pad_to_multiple=args.pad_to_multiple,
        length_grid=args.length_buckets,
        lane_align=args.lane_align)

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    audio_cfg = PooledConfig(
        sample_rate=args.target_sample_rate // 1000, d_model=args.d_model,
        num_heads=args.num_heads, num_layers=args.num_layers, d_ff=args.d_ff,
        dropout=args.dropout, layer_drop=args.layer_drop, remat=args.remat,
        **topology_kwargs(args), **moe_kwargs(args),
        reduction_type=args.audio_reduction_type, reduction_d_k=args.audio_d_k)
    text_cfg = TextEncoderConfig(
        vocab_size=len(vocab), d_model=args.text_d_model,
        num_heads=args.text_num_heads, num_layers=args.text_num_layers,
        d_ff=args.text_d_ff, rpr_k=args.text_rpr_k,
        reduction_type=args.text_reduction_type, reduction_d_k=args.text_d_k,
        encoder_type=args.text_encoder_type)
    model = DualEncoderModel(
        audio_config=audio_cfg, text_config=text_cfg,
        stacking_layers=tuple(args.stacking_layers),
        output_dim=args.output_dim, dtype=dtype)
    loss_module = SymmetricCLIPLoss(init_temperature=args.init_temp,
                                    learn_temperature=args.learn_temp)

    lr_sched = create_lrs(args.lr, args.train_steps, args.lr_scheduler,
                          alpha=args.lr_alpha, warmup_steps=args.warmup_steps,
                          plateau_steps=args.plateau_steps)
    tx = create_optimizer(lr_sched, args.optim, args.weight_decay)

    example_audio = jnp.zeros((2, args.pad_to_multiple), jnp.float32)
    example_text = jnp.zeros((2, 8), jnp.int32)
    mp = model.init(jax.random.PRNGKey(0), example_audio,
                    jnp.asarray([args.pad_to_multiple] * 2), example_text,
                    jnp.asarray([8, 8]))["params"]
    if args.warmstart_text:
        from audio8_tpu.models.warmstart import load_tlm_npz
        import numpy as _np
        te, report = load_tlm_npz(
            jax.tree_util.tree_map(_np.asarray, mp["text_encoder"]),
            args.warmstart_text)
        logger.info("warmstart_text: loaded=%d unexpected=%s",
                    len(report["loaded"]), report["unexpected"][:5])
        mp = dict(mp, text_encoder=te)
    dummy = jnp.zeros((2, args.output_dim))
    lp = loss_module.init(jax.random.PRNGKey(1), dummy, dummy)["params"]
    init_params = {"model": mp, "loss": lp}
    template = TrainState.create(init_params, tx)
    _, state, global_step = resolve_restart(
        args.restart_from, init_params, template, **topology_kwargs(args))
    if state is None:
        state = TrainState.create(init_params, tx, step=global_step)
    state = shard_state(state, mesh, rules, zero1=args.zero1, fsdp=args.fsdp)

    grad_fn, update_fn, eval_fn = make_paired_steps(model, loss_module, tx,
                                                    clip=args.clip)

    validate_on = min(args.train_steps // 2, args.steps_per_checkpoint)
    report_on = max(10, args.steps_per_checkpoint) // 10
    model_base = os.path.join(args.basedir, "checkpoint")
    train_itr = iter(PrefetchLoader(train_set, num_workers=args.num_train_workers, prefetch=4))
    avg_loss = Average("average_train_loss")
    step_time = Average("average_step_time")
    acc_grads, acc_examples = None, 0.0
    iters = 0
    start = time.time()
    # identical on all processes: one global mesh computation (see train.py)
    rng = jax.random.PRNGKey(777)

    while int(state.step) < args.train_steps:
        try:
            freeze_audio = int(state.step) <= args.unfreeze_audio_after_step
            freeze_text = int(state.step) <= args.unfreeze_text_after_step
            iters += 1
            batch = next(train_itr)
            jbatch = put_batch(batch, mesh)
            rng, sub = jax.random.split(rng)
            loss, metrics, grads, bsz, _ = grad_fn(
                state.params, jbatch, sub,
                freeze_audio=freeze_audio, freeze_text=freeze_text)
            acc_grads = accumulate_grads(acc_grads, grads)
            acc_examples += batch["num_real"]
            avg_loss.update(float(loss))
            if iters % args.grad_accum == 0:
                state, _ = update_fn(state, acc_grads, jnp.asarray(acc_examples))
                acc_grads, acc_examples = None, 0.0
                step_time.update(time.time() - start)
                start = time.time()
                gstep = int(state.step)
                if gstep % report_on == 0 and step_time.avg:
                    logger.info("%s, steps/min %.2f, LR %.6f, acc %.3f, T %.3f",
                                avg_loss, 60.0 / step_time.avg,
                                float(state.current_lr or -1),
                                float(metrics["clip_accuracy"]),
                                float(metrics["logit_scale"]))
                if gstep % validate_on == 0:
                    # all processes participate (mesh computation)
                    avg_valid = Average("average_valid_loss")
                    accs = Average("valid_accuracy")
                    for j, vb in enumerate(iter(valid_set)):
                        if j > args.valid_steps:
                            break
                        jvb = put_batch(vb, mesh)
                        vloss, vmetrics = eval_fn(state.params, jvb)
                        avg_valid.update(float(vloss))
                        accs.update(float(vmetrics["clip_accuracy"]))
                    if rank == 0:
                        logger.info({"average_valid_loss": avg_valid.avg,
                                     "valid_accuracy": accs.avg})
                    # collective: orbax synchronizes processes inside save
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


def main():
    train()


if __name__ == "__main__":
    main()
