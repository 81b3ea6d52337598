"""Seq2seq ASR training driver.

Equivalent of /root/reference/audio8/train_seq2seq.py: wav2vec2 encoder +
small transformer decoder with learned-positional tied embeddings, teacher
forcing, grad accumulation, and validation via batched greedy decode
(KV-cached here) + WER/CER.
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
from audio8_tpu.config import DecoderConfig, EncoderConfig
from audio8_tpu.data.datasets import AudioTextLetterDataset, PrefetchLoader
from audio8_tpu.models.seq2seq import Seq2Seq
from audio8_tpu.models.text import TextVectorizer, read_vocab_file
from audio8_tpu.ops import metrics as M
from audio8_tpu.parallel.sharding import put_batch, shard_state, to_host
from audio8_tpu.train.checkpoint import save_checkpoint
from audio8_tpu.train.preempt import PreemptionGuard
from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
from audio8_tpu.train.steps import accumulate_grads, make_seq2seq_steps
from audio8_tpu.utils import Average, Offsets, revlut, str2bool

logger = logging.getLogger("audio8_tpu.seq2seq")


def parse_args(argv=None):
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--basedir", type=str)
    parser.add_argument("--root_dir")
    parser.add_argument("--train_dataset", type=str)
    parser.add_argument("--valid_dataset", type=str)
    parser.add_argument("--dict_file", type=str, default="dict.{}.txt")
    parser.add_argument("--dataset_key", default="LibriSpeech")
    parser.add_argument("--grad_accum", type=int, default=2)
    parser.add_argument("--loss_reduction_type", default="sum", choices=["sum", "token"])
    parser.add_argument("--decoder_dropout", type=float, default=0.1)
    parser.add_argument("--decoder_layers", type=int, default=2)
    parser.add_argument("--decoder_heads", type=int, default=4)
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
    parser.add_argument("--valid_beam", type=int, default=1,
                        help="beam width for validation decoding (jitted "
                             "KV-cached beam search; 1 = greedy like the "
                             "reference)")
    parser.add_argument("--steps_per_checkpoint", type=int, default=2400)
    parser.add_argument("--verbose", type=str2bool, default=False)
    parser.add_argument("--distributed", type=str2bool, default=False)
    parser.add_argument("--vocab_file")
    parser.add_argument("--early_stopping_metric", type=str)
    parser.add_argument("--target_tokens_per_batch", type=int, default=700_000)
    parser.add_argument("--target_type", choices=["wrd", "ltr", "bpe"], default="ltr")
    parser.add_argument("--freeze_fx", type=str2bool, default=True)
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
        args.basedir = f"wav2vec2-s2s-{args.dataset_key}-{os.getpid()}"
    os.makedirs(args.basedir, exist_ok=True)

    Offsets.remap_fairseq_ctc()
    rank, world = setup(args.distributed)
    preempt = PreemptionGuard()  # catch SIGTERM from here on
    mesh, rules, batch_multiple, row_shard = setup_parallelism(args.tensor_parallel)

    vocab_file = args.vocab_file or os.path.join(args.root_dir, args.dict_file)
    vocab = read_vocab_file(vocab_file)
    vec = TextVectorizer(vocab, ["<s>"], ["</s>"])
    index2vocab = revlut(vocab)
    use_bpe = args.target_type == "bpe"
    postproc = M.postproc_bpe if use_bpe else M.postproc_letters

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
        length_grid=args.length_buckets,
        lane_align=args.lane_align,
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
        length_grid=args.length_buckets,
        lane_align=args.lane_align)

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    enc_cfg = EncoderConfig(
        sample_rate=args.target_sample_rate // 1000, d_model=args.d_model,
        num_heads=args.num_heads, num_layers=args.num_layers, d_ff=args.d_ff,
        dropout=args.dropout, timestep_masking=args.timestep_masking,
        timestep_mask_len=args.timestep_mask_len,
        channel_masking=args.channel_masking,
        channel_mask_len=args.channel_mask_len, layer_drop=args.layer_drop,
        remat=args.remat, **topology_kwargs(args), **moe_kwargs(args),
        freeze_fx=args.freeze_fx)
    dec_cfg = DecoderConfig(
        vocab_size=len(vocab), d_model=args.d_model,
        num_heads=args.decoder_heads, num_layers=args.decoder_layers,
        dropout=args.decoder_dropout)
    model = Seq2Seq(encoder_config=enc_cfg, decoder_config=dec_cfg, dtype=dtype)

    lr_sched = create_lrs(args.lr, args.train_steps, args.lr_scheduler,
                          alpha=args.lr_alpha, warmup_steps=args.warmup_steps,
                          plateau_steps=args.plateau_steps)
    tx = create_optimizer(lr_sched, args.optim, args.weight_decay)

    example = jnp.zeros((1, args.pad_to_multiple), jnp.float32)
    init_params = model.init(
        jax.random.PRNGKey(0), example, jnp.asarray([args.pad_to_multiple]),
        jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]))["params"]
    template = TrainState.create(init_params, tx)
    params, state, global_step = resolve_restart(
        args.restart_from, init_params, template, ctc=True,
        num_layers=args.num_layers, sr=args.target_sample_rate // 1000,
        restart_tt=args.restart_tt, **topology_kwargs(args))
    if state is None:
        state = TrainState.create(params, tx, step=global_step)
    state = shard_state(state, mesh, rules, zero1=args.zero1, fsdp=args.fsdp)
    n_params = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(state.params))
    logger.info("Model has %s parameters", f"{int(n_params):,}")

    grad_fn, update_fn, decode_fn, eval_loss_fn = make_seq2seq_steps(
        model, tx, clip=args.clip, loss_reduction=args.loss_reduction_type)

    validate_on = min(args.train_steps // 2, args.steps_per_checkpoint)
    report_on = max(10, args.steps_per_checkpoint) // 10
    model_base = os.path.join(args.basedir, "checkpoint")

    train_itr = iter(PrefetchLoader(train_set, num_workers=args.num_train_workers, prefetch=4))
    avg_loss = Average("average_train_loss")
    step_time = Average("average_step_time")
    best_metric = 1e8
    acc_grads, acc_examples = None, 0.0
    iters = 0
    start = time.time()
    # identical on all processes: one global mesh computation (see train.py)
    rng = jax.random.PRNGKey(4321)

    while int(state.step) < args.train_steps:
        try:
            freeze = int(state.step) <= args.unfreeze_enc_after_step
            iters += 1
            batch = next(train_itr)
            jbatch = put_batch(batch, mesh)
            rng, sub = jax.random.split(rng)
            loss, grads, bsz, _ = grad_fn(state.params, jbatch, sub, freeze=freeze)
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
                    logger.info("%s, steps/min %.2f, LR %.6f", avg_loss,
                                60.0 / step_time.avg, float(state.current_lr or -1))
                if gstep % validate_on == 0:
                    # validation + checkpointing are collective (see
                    # cli/train.py); metrics are globally reduced so the
                    # best-metric decision matches on every process
                    vm = validate(state.params, valid_set, decode_fn, eval_loss_fn,
                                  index2vocab, args.valid_steps, postproc,
                                  args.verbose and rank == 0, mesh,
                                  beam=args.valid_beam)
                    if rank == 0:
                        logger.info({"average_train_loss": avg_loss.avg})
                        logger.info(vm)
                    save_checkpoint(state, model_base, gstep, tick_type="step")
                    esm = args.early_stopping_metric
                    if esm and vm.get(esm, 1e9) < best_metric:
                        best_metric = vm[esm]
                        save_checkpoint(state, model_base, 0, tick_type="best")

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


def validate(params, valid_set, decode_fn, eval_loss_fn, index2vocab,
             valid_steps, postproc, verbose=False, mesh=None, beam=1):
    avg_valid_loss = Average("average_valid_loss")
    c_errors = c_total = w_errors = w_total = 0
    vm = {}
    for j, batch in enumerate(iter(valid_set)):
        if j > valid_steps:
            break
        try:
            jbatch = (put_batch(batch, mesh) if mesh is not None else
                      {k: jnp.asarray(v) for k, v in batch.items()
                       if isinstance(v, np.ndarray)})
            loss = eval_loss_fn(params, jbatch)
            # round the decode horizon up to a multiple of 32 so the jitted
            # decode compiles for a handful of lengths, not per batch;
            # token_lengths here are this shard's — the horizon must agree
            # globally, so derive it from the text pad width instead
            max_len = int(batch["token_ids"].shape[1])
            max_len = (max_len + 31) // 32 * 32
            toks, _ = decode_fn(params, jbatch, max_output_len=max_len,
                                beam=beam)
            # score only this shard's real rows (frames are global; padding
            # rows sit at the global tail)
            lo = batch.get("row_offset", 0)
            n_here = batch["signal_lengths"].shape[0]
            n_real = min(max(batch.get("num_real", n_here) - lo, 0), n_here)
            toks_np = to_host(toks)[lo:lo + n_real]
            # strip EOS and post-EOS padding before scoring (the metrics
            # only mask specials out of the *target* side)
            decoded = [
                [t for t in row.tolist() if t not in (Offsets.PAD, Offsets.EOS)]
                for row in toks_np
            ]
            sm = M.decode_metrics(decoded, batch["token_ids"][:n_real, 1:],
                                  index2vocab, postproc_fn=postproc)
            if verbose:
                for sent, gold in zip(decoded, batch["token_ids"][:n_real]):
                    print("Pred: ", postproc(index2vocab[t] for t in sent
                                             if t > Offsets.UNK))
                    print("Gold: ", postproc(index2vocab[int(t)] for t in gold
                                             if int(t) > Offsets.UNK))
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
    vm = {
        "average_valid_loss": avg_valid_loss.avg,
        "cer": (c_errors / max(c_total, 1)) * 100,
        "wer": (w_errors / max(w_total, 1)) * 100,
    }
    return vm


def main():
    train()


if __name__ == "__main__":
    main()
