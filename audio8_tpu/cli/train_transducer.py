"""RNN-T (transducer) fine-tuning driver.

A streaming-ASR workload beyond the reference (audio8's trainable heads
are CTC, /root/reference/audio8/train.py, and attention seq2seq,
train_seq2seq.py): wav2vec2 encoder + LSTM prediction network +
additive joint, trained with the transducer objective
(ops/transducer.py) on the same TSV/.ltr|.bpe corpora as ``a8t-train``.
The loop mirrors ``cli/train.py`` — grad accumulation, global
example-count gradient scaling, warmup+cosine LR, encoder
freeze/unfreeze at a step boundary, mesh data parallelism, periodic
greedy-decode validation with WER/CER and best-metric checkpoints,
preemption-safe SIGTERM handling.

    a8t-train-transducer --root_dir corpus --train_dataset train.tsv \
        --valid_dataset valid.tsv --basedir runs/rnnt
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
from audio8_tpu.config import TransducerConfig
from audio8_tpu.data.datasets import AudioTextLetterDataset, PrefetchLoader
from audio8_tpu.models.text import TextVectorizer, read_vocab_list
from audio8_tpu.models.transducer import Transducer
from audio8_tpu.ops import metrics as M
from audio8_tpu.parallel.sharding import put_batch, shard_state, to_host
from audio8_tpu.train.checkpoint import save_checkpoint
from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
from audio8_tpu.train.preempt import PreemptionGuard
from audio8_tpu.train.steps import accumulate_grads, make_transducer_steps
from audio8_tpu.utils import Average, Offsets, revlut, str2bool

logger = logging.getLogger("audio8_tpu.train_transducer")


def parse_args(argv=None):
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--basedir", type=str)
    parser.add_argument("--root_dir")
    parser.add_argument("--train_dataset", type=str)
    parser.add_argument("--valid_dataset", type=str)
    parser.add_argument("--dict_file", type=str, default="dict.{}.txt")
    parser.add_argument("--dataset_key", default="LibriSpeech")
    parser.add_argument("--grad_accum", type=int, default=2)
    parser.add_argument("--loss_reduction_type", default="sum",
                        choices=["sum", "mean"])
    parser.add_argument("--fused_loss", type=str2bool, default=False,
                        help="analytic alpha/beta occupancy VJP for the "
                             "RNN-T loss instead of autodiff-through-scan "
                             "(first-order only; see ops/transducer.py)")
    parser.add_argument("--num_train_workers", type=int, default=4)
    parser.add_argument("--max_sample_len", type=int)
    parser.add_argument("--lr_scheduler", default="cosine")
    parser.add_argument("--lr_alpha", type=float, default=0.0)
    parser.add_argument("--optim", default="adamw")
    parser.add_argument("--lr", type=float, default=1.0e-4)
    parser.add_argument("--clip", type=float, default=25.0)
    parser.add_argument("--weight_decay", type=float, default=0.0)
    parser.add_argument("--restart_tt", choices=["step", "ignore"])
    parser.add_argument("--restart_from", type=str)
    parser.add_argument("--warmup_steps", type=int, default=10000)
    parser.add_argument("--plateau_steps", type=int, default=0)
    parser.add_argument("--unfreeze_enc_after_step", type=int, default=10_000)
    parser.add_argument("--timestep_masking", type=float, default=0.5)
    parser.add_argument("--timestep_mask_len", type=int, default=10)
    parser.add_argument("--channel_masking", type=float, default=0.1)
    parser.add_argument("--channel_mask_len", type=int, default=64)
    parser.add_argument("--train_steps", type=int, default=320_000)
    parser.add_argument("--valid_steps", type=int, default=1000)
    parser.add_argument("--steps_per_checkpoint", type=int, default=2400)
    parser.add_argument("--distributed", type=str2bool, default=False)
    parser.add_argument("--vocab_file")
    parser.add_argument("--early_stopping_metric", type=str)
    parser.add_argument("--target_tokens_per_batch", type=int, default=700_000)
    parser.add_argument("--target_type", choices=["wrd", "ltr", "bpe"],
                        default="ltr")
    parser.add_argument("--freeze_fx", type=str2bool, default=True)
    # prediction network / joint
    parser.add_argument("--pred_layers", type=int, default=2)
    parser.add_argument("--pred_dim", type=int, default=512)
    parser.add_argument("--pred_embed_dim", type=int, default=256)
    parser.add_argument("--pred_dropout", type=float, default=0.1)
    parser.add_argument("--d_joint", type=int, default=512)
    parser.add_argument("--max_decode_len", type=int, default=200)
    parser.add_argument("--max_symbols_per_frame", type=int, default=4)
    parser.add_argument("--valid_beam", type=int, default=1,
                        help=">1: validation decodes with the 1-best of "
                             "the time-synchronous beam search "
                             "(Transducer.decode_beam) instead of greedy")
    parser.add_argument("--pad_to_multiple", type=int, default=16_000)
    parser.add_argument("--noise_manifest",
                        help="additive-noise augmentation source: an audio "
                             "manifest TSV or a directory of WAV/FLAC noise "
                             "clips (data/audio.NoiseMixer, MUSAN-style)")
    parser.add_argument("--noise_snr", type=float, nargs=2,
                        default=[5.0, 20.0],
                        help="uniform SNR-dB range for --noise_manifest")
    parser.add_argument("--noise_prob", type=float, default=1.0,
                        help="per-utterance probability of mixing noise")
    parser.add_argument("--speed_perturb", type=float, nargs="*",
                        help="speed-perturbation factors for training "
                             "utterances (e.g. 0.9 1.0 1.1, the Kaldi/"
                             "fairseq 3-way recipe); polyphase resample "
                             "per read, transcripts unchanged "
                             "(data/audio.speed_perturb_wav)")
    parser.add_argument("--lane_align", type=str2bool, default=True)
    parser.add_argument("--length_buckets", type=int, nargs="*")
    parser.add_argument("--profile_dir", type=str)
    add_common_model_args(parser)
    return apply_preset(parser.parse_args(argv))


def train(argv=None):
    args = parse_args(argv)
    args.dict_file = args.dict_file.format(args.target_type)
    if args.basedir is None:
        args.basedir = f"transducer-{args.dataset_key}-{os.getpid()}"
    os.makedirs(args.basedir, exist_ok=True)

    Offsets.remap_fairseq_ctc()
    rank, world = setup(args.distributed)
    preempt = PreemptionGuard()
    mesh, rules, batch_multiple, row_shard = setup_parallelism(
        args.tensor_parallel)

    vocab_file = args.vocab_file or os.path.join(args.root_dir, args.dict_file)
    vocab_list = read_vocab_list(vocab_file)
    vocab = {v: i for i, v in enumerate(vocab_list)}
    vec = TextVectorizer(vocab)
    index2vocab = revlut(vocab)
    postproc = (M.postproc_bpe if args.target_type == "bpe"
                else M.postproc_letters)

    noise_mixer = None
    if args.noise_manifest:
        from audio8_tpu.data.audio import NoiseMixer

        noise_mixer = NoiseMixer(args.noise_manifest,
                                 snr_db=args.noise_snr,
                                 prob=args.noise_prob)
    train_set = AudioTextLetterDataset(
        os.path.join(args.root_dir, args.train_dataset), vec,
        args.target_tokens_per_batch, args.max_sample_len,
        input_sample_rate=args.input_sample_rate,
        target_sample_rate=args.target_sample_rate,
        shuffle=True, tgt_type=args.target_type,
        shard_index=rank, num_shards=world,
        batch_multiple=batch_multiple, row_shard=row_shard,
        pad_to_multiple=args.pad_to_multiple,
        length_grid=args.length_buckets, lane_align=args.lane_align,
        speed_perturb=args.speed_perturb or (),
        noise_mixer=noise_mixer)
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
        length_grid=args.length_buckets, lane_align=args.lane_align)
    logger.info("Loaded datasets")

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg = TransducerConfig(
        vocab_size=len(vocab), sample_rate=args.target_sample_rate // 1000,
        d_model=args.d_model, num_heads=args.num_heads,
        num_layers=args.num_layers, d_ff=args.d_ff, dropout=args.dropout,
        attention_dropout=args.attention_dropout,
        remat=args.remat, **topology_kwargs(args), **moe_kwargs(args),
        timestep_masking=args.timestep_masking,
        timestep_mask_len=args.timestep_mask_len,
        channel_masking=args.channel_masking,
        channel_mask_len=args.channel_mask_len,
        layer_drop=args.layer_drop, freeze_fx=args.freeze_fx,
        pred_layers=args.pred_layers, pred_dim=args.pred_dim,
        pred_embed_dim=args.pred_embed_dim, pred_dropout=args.pred_dropout,
        d_joint=args.d_joint)
    model = Transducer(config=cfg, dtype=dtype)

    lr_sched = create_lrs(args.lr, args.train_steps, args.lr_scheduler,
                          alpha=args.lr_alpha, warmup_steps=args.warmup_steps,
                          plateau_steps=args.plateau_steps)
    tx = create_optimizer(lr_sched, args.optim, args.weight_decay)

    example_sig = jnp.zeros((1, args.pad_to_multiple), jnp.float32)
    example_tgt = jnp.zeros((1, 8), jnp.int32)
    init_params = model.init(jax.random.PRNGKey(0), example_sig,
                             jnp.asarray([args.pad_to_multiple], jnp.int32),
                             example_tgt)["params"]
    template = TrainState.create(init_params, tx)
    # --restart_from: a8t transducer checkpoint dir/file; fairseq/HF
    # encoder checkpoints warm-start the ``encoder`` subtree (their CTC
    # proj / quantizer heads are dropped by merge_params)
    params, state, global_step = resolve_restart(
        args.restart_from, init_params, template, ctc=True,
        num_layers=args.num_layers, sr=args.target_sample_rate // 1000,
        restart_tt=args.restart_tt, **topology_kwargs(args))
    if state is None:
        state = TrainState.create(params, tx, step=global_step)
    state = shard_state(state, mesh, rules, zero1=args.zero1, fsdp=args.fsdp)
    n_params = sum(np.prod(l.shape)
                   for l in jax.tree_util.tree_leaves(state.params))
    logger.info("Model has %s parameters", f"{int(n_params):,}")

    grad_fn, update_fn, decode_fn, eval_loss_fn = make_transducer_steps(
        model, tx, clip=args.clip, loss_reduction=args.loss_reduction_type,
        mesh=mesh, fused_loss=args.fused_loss)

    from audio8_tpu.train.profiler import StepProfiler
    profiler = StepProfiler(args.profile_dir)

    validate_on = min(args.train_steps // 2, args.steps_per_checkpoint)
    report_on = max(10, args.steps_per_checkpoint) // 10
    model_base = os.path.join(args.basedir, "checkpoint")

    train_itr = iter(PrefetchLoader(
        train_set, num_workers=args.num_train_workers, prefetch=4))
    avg_loss = Average("average_train_loss")
    step_time = Average("average_step_time")
    batch_size_sent = Average("batch_size")
    batch_size_toks = Average("batch_toks")
    best_metric = 1e8

    acc_grads = None
    acc_examples = 0.0
    acc_tokens = 0.0
    iters = 0
    start = time.time()
    rng = jax.random.PRNGKey(1234)
    fused = args.grad_accum == 1

    gstep = int(state.step)
    while gstep < args.train_steps:
        try:
            freeze = gstep <= args.unfreeze_enc_after_step
            iters += 1
            batch = next(train_itr)
            jbatch = put_batch(batch, mesh)
            rng, sub = jax.random.split(rng)
            if fused:
                state, loss, _, _ = grad_fn.train_step(state, jbatch, sub,
                                                       freeze=freeze)
            else:
                loss, grads, bsz, toks = grad_fn(state.params, jbatch, sub,
                                                 freeze=freeze)
                acc_grads = accumulate_grads(acc_grads, grads)
            acc_examples += batch["num_real"]
            acc_tokens += (float(batch["token_lengths"].sum())
                           * jax.process_count())
            if iters % 8 == 0:
                avg_loss.update(float(loss), n=8)

            if iters % args.grad_accum == 0:
                if not fused:
                    state, _ = update_fn(state, acc_grads,
                                         jnp.asarray(acc_examples, jnp.float32))
                batch_size_sent.update(acc_examples)
                batch_size_toks.update(acc_tokens)
                acc_grads, acc_examples, acc_tokens = None, 0.0, 0.0
                gstep += 1
                profiler.step(gstep)
                elapsed = time.time() - start
                step_time.update(elapsed)
                start = time.time()

                if gstep % report_on == 0 and step_time.avg:
                    sps = 1.0 / step_time.avg
                    lr_now = state.current_lr
                    logger.info(
                        "%s, steps/min %.2f, LR %.6f, batch (samples %.2f, "
                        "toks %.2f)",
                        avg_loss, sps * 60,
                        float(lr_now) if lr_now is not None else -1,
                        batch_size_sent.avg, batch_size_toks.avg)

                if gstep % validate_on == 0:
                    metrics = {"average_train_loss": avg_loss.avg}
                    valid_metrics = validate(
                        decode_fn, eval_loss_fn, state.params, valid_set,
                        index2vocab, args.valid_steps, postproc,
                        args.max_decode_len, args.max_symbols_per_frame,
                        mesh, beam=args.valid_beam)
                    if rank == 0:
                        logger.info(metrics)
                        logger.info(valid_metrics)
                    save_checkpoint(state, model_base, gstep,
                                    tick_type="step")
                    esm = args.early_stopping_metric
                    if esm and valid_metrics.get(esm, 1e9) < best_metric:
                        best_metric = valid_metrics[esm]
                        if rank == 0:
                            logger.info("New best metric %.4f", best_metric)
                        save_checkpoint(state, model_base, 0,
                                        tick_type="best")

                if preempt.should_save(gstep):
                    save_checkpoint(state, model_base, gstep,
                                    tick_type="step")
                    if rank == 0:
                        logger.warning("preempted: saved step %d, exiting",
                                       gstep)
                    break
        except StopIteration:
            raise
        except Exception as e:
            logger.exception("step failed: %s", e)
    return state


def validate(decode_fn, eval_loss_fn, params, valid_set, index2vocab,
             valid_steps, postproc, max_decode_len, max_symbols, mesh=None,
             beam: int = 1):
    """Greedy transducer decode + WER/CER over the validation stream
    (the transducer analog of cli/train.py's CTC validate)."""
    avg_valid_loss = Average("average_valid_loss")
    c_errors = c_total = w_errors = w_total = 0
    valid_start = time.time()
    for j, batch in enumerate(iter(valid_set)):
        if j > valid_steps:
            break
        try:
            jbatch = (put_batch(batch, mesh) if mesh is not None else
                      {k: jnp.asarray(v) for k, v in batch.items()
                       if isinstance(v, np.ndarray)})
            loss = eval_loss_fn(params, jbatch)
            toks, lengths = decode_fn(params, jbatch,
                                      max_output_len=max_decode_len,
                                      max_symbols=max_symbols, beam=beam)
            lo = batch.get("row_offset", 0)
            n_here = batch["signal_lengths"].shape[0]
            n_real = min(max(batch.get("num_real", n_here) - lo, 0), n_here)
            toks_np = to_host(toks)[lo:lo + n_real]
            lens_np = to_host(lengths)[lo:lo + n_real]
            decoded = [toks_np[i, :lens_np[i]].tolist()
                       for i in range(n_real)]
            sm = M.decode_metrics(decoded, batch["token_ids"][:n_real],
                                  index2vocab, postproc_fn=postproc)
            c_errors += sm["c_errors"]
            w_errors += sm["w_errors"]
            c_total += sm["c_total"]
            w_total += sm["w_total"]
            avg_valid_loss.update(float(loss))
        except Exception as e:
            logger.exception("valid step failed: %s", e)
    from audio8_tpu.parallel.sharding import global_sum_scalars

    c_errors, c_total, w_errors, w_total = global_sum_scalars(
        [c_errors, c_total, w_errors, w_total])
    return {
        "average_valid_loss": avg_valid_loss.avg,
        "valid_elapsed_epoch": time.time() - valid_start,
        "cer": (c_errors / max(c_total, 1)) * 100,
        "wer": (w_errors / max(w_total, 1)) * 100,
    }


def main():
    train()


if __name__ == "__main__":
    main()
