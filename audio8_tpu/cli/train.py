"""CTC fine-tuning driver.

Equivalent of /root/reference/audio8/train.py: letter/BPE-target CTC
training of a wav2vec2 acoustic model with grad accumulation, global
example-count gradient scaling, warmup+cosine LR, freeze/unfreeze of the
encoder at a step boundary, periodic validation with WER/CER and
best-metric early-stop checkpoints.
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
from audio8_tpu.config import AcousticConfig
from audio8_tpu.data.datasets import AudioTextLetterDataset, PrefetchLoader
from audio8_tpu.models.text import TextVectorizer, read_vocab_list
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.ops import metrics as M
from audio8_tpu.parallel.sharding import put_batch, shard_state, to_host
from audio8_tpu.train.checkpoint import save_checkpoint
from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
from audio8_tpu.train.preempt import PreemptionGuard
from audio8_tpu.train.steps import accumulate_grads, make_ctc_steps
from audio8_tpu.utils import Average, Offsets, revlut, str2bool

logger = logging.getLogger("audio8_tpu.train")


def parse_args(argv=None):
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--basedir", type=str)
    parser.add_argument("--root_dir")
    parser.add_argument("--train_dataset", type=str)
    parser.add_argument("--valid_dataset", type=str)
    parser.add_argument("--dict_file", type=str, default="dict.{}.txt")
    parser.add_argument("--dataset_key", default="LibriSpeech")
    parser.add_argument("--grad_accum", type=int, default=2)
    parser.add_argument("--loss_reduction_type", default="sum", choices=["sum", "mean"])
    parser.add_argument("--pipeline_parallel", type=int, default=1,
                        help="devices on a 'pipe' mesh axis: GPipe-stage "
                             "the transformer stack (parallel/pipeline.py); "
                             "the rest go to 'data'. Requires "
                             "--grad_accum 1, --unfreeze_enc_after_step -1, "
                             "and excludes --tensor_parallel/--zero1/"
                             "--sequence_parallel")
    parser.add_argument("--pp_microbatches", type=int, default=4,
                        help="GPipe microbatches per step under "
                             "--pipeline_parallel (bubble = (S-1)/(M+S-1))")
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
    parser.add_argument("--verbose", type=str2bool, default=False)
    parser.add_argument("--distributed", type=str2bool, default=False)
    parser.add_argument("--vocab_file")
    parser.add_argument("--early_stopping_metric", type=str)
    parser.add_argument("--target_tokens_per_batch", type=int, default=700_000)
    parser.add_argument("--target_type", choices=["wrd", "ltr", "bpe"], default="ltr")
    parser.add_argument("--freeze_fx", type=str2bool, default=True)
    parser.add_argument("--lm")
    parser.add_argument("--beam", type=int, default=1)
    parser.add_argument("--alpha", type=float, default=0.7)
    parser.add_argument("--beta", type=float, default=5.0)
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
    parser.add_argument("--profile_dir", type=str,
                        help="capture a jax.profiler trace window here")
    add_common_model_args(parser)
    return apply_preset(parser.parse_args(argv))


def train(argv=None):
    args = parse_args(argv)
    args.dict_file = args.dict_file.format(args.target_type)
    if args.basedir is None:
        args.basedir = f"wav2vec2-{args.dataset_key}-{os.getpid()}"
    os.makedirs(args.basedir, exist_ok=True)

    Offsets.remap_fairseq_ctc()
    rank, world = setup(args.distributed)
    preempt = PreemptionGuard()  # catch SIGTERM from here on
    if args.pipeline_parallel > 1:
        if args.grad_accum != 1 or args.unfreeze_enc_after_step >= 0:
            raise ValueError("--pipeline_parallel requires --grad_accum 1 "
                             "and --unfreeze_enc_after_step -1 (the "
                             "pipelined step always trains the stack)")
        if args.zero1 or args.fsdp or args.sequence_parallel:
            raise ValueError("--pipeline_parallel excludes --zero1, "
                             "--fsdp and --sequence_parallel")
    mesh, rules, batch_multiple, row_shard = setup_parallelism(
        args.tensor_parallel, args.pipeline_parallel, args.pp_microbatches)

    vocab_file = args.vocab_file or os.path.join(args.root_dir, args.dict_file)
    vocab_list = read_vocab_list(vocab_file)
    vocab = {v: i for i, v in enumerate(vocab_list)}
    vec = TextVectorizer(vocab)
    index2vocab = revlut(vocab)
    use_bpe = args.target_type == "bpe"
    postproc = M.postproc_bpe if use_bpe else M.postproc_letters

    ctc_decoder = None
    if args.verbose:
        from audio8_tpu.ops.beam import PrefixBeamSearch
        ctc_decoder = PrefixBeamSearch(vocab_list, alpha=args.alpha,
                                       beta=args.beta, beam=args.beam,
                                       lm_file=args.lm)

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
    logger.info("Loaded datasets")

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg = AcousticConfig(
        num_labels=len(vocab), sample_rate=args.target_sample_rate // 1000,
        d_model=args.d_model, num_heads=args.num_heads,
        num_layers=args.num_layers, d_ff=args.d_ff, dropout=args.dropout,
        attention_dropout=args.attention_dropout,
        remat=args.remat, **topology_kwargs(args),
        timestep_masking=args.timestep_masking,
        timestep_mask_len=args.timestep_mask_len,
        channel_masking=args.channel_masking,
        channel_mask_len=args.channel_mask_len,
        sequence_parallel=args.sequence_parallel, **moe_kwargs(args),
        layer_drop=args.layer_drop, freeze_fx=args.freeze_fx)
    model = Wav2Vec2AcousticModel(config=cfg, dtype=dtype)

    lr_sched = create_lrs(args.lr, args.train_steps, args.lr_scheduler,
                          alpha=args.lr_alpha, warmup_steps=args.warmup_steps,
                          plateau_steps=args.plateau_steps)
    tx = create_optimizer(lr_sched, args.optim, args.weight_decay)

    example = jnp.zeros((1, args.pad_to_multiple), jnp.float32)
    init_params = model.init(jax.random.PRNGKey(0), example)["params"]
    template = TrainState.create(init_params, tx)
    params, state, global_step = resolve_restart(
        args.restart_from, init_params, template, ctc=True,
        num_layers=args.num_layers, sr=args.target_sample_rate // 1000,
        restart_tt=args.restart_tt, **topology_kwargs(args))
    if state is None:
        state = TrainState.create(params, tx, step=global_step)
    # place params + optimizer state on the mesh (replicated under pure DP,
    # Megatron-split under TP); every step below runs through the mesh
    state = shard_state(state, mesh, rules, zero1=args.zero1, fsdp=args.fsdp)
    n_params = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(state.params))
    logger.info("Model has %s parameters", f"{int(n_params):,}")

    if args.pipeline_parallel > 1:
        from types import SimpleNamespace

        from audio8_tpu.parallel.pipeline import make_pp_ctc_steps

        pp_train, eval_fn = make_pp_ctc_steps(
            model, tx, mesh, args.pp_microbatches, clip=args.clip,
            loss_reduction=args.loss_reduction_type)
        # the pipelined step always trains the stack (freeze would make
        # the pipeline pointless); grad_accum==1 is enforced above so the
        # loop only uses the fused path
        grad_fn = SimpleNamespace(
            train_step=lambda state, batch, rng, freeze=False:
                pp_train(state, batch, rng))
        update_fn = None
    else:
        grad_fn, update_fn, eval_fn = make_ctc_steps(
            model, tx, clip=args.clip, loss_reduction=args.loss_reduction_type,
            mesh=mesh)

    from audio8_tpu.train.profiler import StepProfiler
    profiler = StepProfiler(args.profile_dir)

    validate_on = min(args.train_steps // 2, args.steps_per_checkpoint)
    report_on = max(10, args.steps_per_checkpoint) // 10
    model_base = os.path.join(args.basedir, "checkpoint")

    train_itr = iter(PrefetchLoader(train_set, num_workers=args.num_train_workers, prefetch=4))
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
    # NOT rank-offset: under mesh DP all processes drive one global
    # computation, so the key (like the params) must be identical everywhere
    rng = jax.random.PRNGKey(1234)

    # one dispatch per step when not accumulating (fused grad+update)
    fused = args.grad_accum == 1

    gstep = int(state.step)  # python-side mirror: avoid a device sync/iter
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
            # global batch sizes are known host-side (on-device sums would
            # sync; the dataset reports the real-row count per global batch)
            acc_examples += batch["num_real"]
            # token_lengths is this process's row block; every process holds
            # an equal block of the global batch, so scale to global tokens
            # (matching acc_examples, which is already global)
            acc_tokens += float(batch["token_lengths"].sum()) * jax.process_count()
            if iters % 8 == 0:  # subsample the loss fetch (host sync)
                avg_loss.update(float(loss), n=8)

            if iters % args.grad_accum == 0:
                if not fused:
                    state, gnorm = update_fn(state, acc_grads,
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
                        "%s, steps/min %.2f, LR %.6f, batch (samples %.2f, toks %.2f, toks/min %.2f)",
                        avg_loss, sps * 60,
                        float(lr_now) if lr_now is not None else -1,
                        batch_size_sent.avg, batch_size_toks.avg,
                        batch_size_toks.avg * sps * 60)

                if gstep % validate_on == 0:
                    # validation and checkpointing are COLLECTIVE: every
                    # process runs the mesh computation and calls the
                    # (orbax-synchronized) save; only rank 0 logs. The
                    # validation metrics are globally reduced, so the
                    # best-metric decision is identical on every process.
                    metrics = {"average_train_loss": avg_loss.avg}
                    valid_metrics = validate(
                        model, eval_fn, state.params, valid_set, index2vocab,
                        args.valid_steps, postproc, ctc_decoder,
                        args.verbose and rank == 0, mesh)
                    if rank == 0:
                        logger.info(metrics)
                        logger.info(valid_metrics)
                    save_checkpoint(state, model_base, gstep, tick_type="step")
                    esm = args.early_stopping_metric
                    if esm and valid_metrics.get(esm, 1e9) < best_metric:
                        best_metric = valid_metrics[esm]
                        if rank == 0:
                            logger.info("New best metric %.4f", best_metric)
                        save_checkpoint(state, model_base, 0, tick_type="best")

                if preempt.should_save(gstep):
                    # preemption notice: checkpoint at this (globally
                    # agreed) step boundary and stop cleanly
                    save_checkpoint(state, model_base, gstep, tick_type="step")
                    if rank == 0:
                        logger.warning("preempted: saved step %d, exiting", gstep)
                    break
        except StopIteration:
            raise
        except Exception as e:
            logger.exception("step failed: %s", e)
    return state


def validate(model, eval_fn, params, valid_set, index2vocab, valid_steps,
             postproc, ctc_decoder=None, verbose=False, mesh=None):
    avg_valid_loss = Average("average_valid_loss")
    c_errors = c_total = w_errors = w_total = 0
    valid_start = time.time()
    vm = {}
    for j, batch in enumerate(iter(valid_set)):
        if j > valid_steps:
            break
        try:
            jbatch = (put_batch(batch, mesh) if mesh is not None else
                      {k: jnp.asarray(v) for k, v in batch.items()
                       if isinstance(v, np.ndarray)})
            loss, frames, frame_lengths = eval_fn(params, jbatch)
            # score only this process's real rows: frames are global, the
            # host-side token_ids are this shard's block; padding rows sit
            # at the global tail
            lo = batch.get("row_offset", 0)
            n_here = batch["signal_lengths"].shape[0]
            n_real = min(max(batch.get("num_real", n_here) - lo, 0), n_here)
            frames_np = to_host(frames)[lo:lo + n_real]
            fl_np = to_host(frame_lengths)[lo:lo + n_real]
            sm = M.ctc_metrics(frames_np, batch["token_ids"][:n_real],
                               fl_np, index2vocab, postproc_fn=postproc)
            if ctc_decoder is not None and verbose and n_real > 0:
                # beam-decode the first utterance for inspection, mirroring
                # the reference's verbose validation (train.py:49-52); runs
                # from the host copy so it stays process-local
                host_params = jax.tree_util.tree_map(to_host, params)
                lp, pm = model.apply(
                    {"params": host_params},
                    jnp.asarray(batch["signal"][:1]),
                    jnp.asarray(batch["signal_lengths"][:1]),
                    train=False, freeze=True)
                fl = np.asarray(jnp.sum(pm, axis=-1))
                transcriptions = ctc_decoder.run(np.asarray(lp), fl, n_best=1)
                print("".join(transcriptions[0]))
            c_errors += sm["c_errors"]
            w_errors += sm["w_errors"]
            c_total += sm["c_total"]
            w_total += sm["w_total"]
            avg_valid_loss.update(float(loss))
        except Exception as e:
            logger.exception("valid step failed: %s", e)
    # under multi-host each process scored its own row block; reduce to
    # GLOBAL error counts so every process reports (and early-stops on)
    # the same numbers
    from audio8_tpu.parallel.sharding import global_sum_scalars

    c_errors, c_total, w_errors, w_total = global_sum_scalars(
        [c_errors, c_total, w_errors, w_total])
    vm = {
        "average_valid_loss": avg_valid_loss.avg,
        "valid_elapsed_epoch": time.time() - valid_start,
        "cer": (c_errors / max(c_total, 1)) * 100,
        "wer": (w_errors / max(w_total, 1)) * 100,
    }
    return vm


def main():
    train()


if __name__ == "__main__":
    main()
