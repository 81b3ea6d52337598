"""Offline eval/decode harness: WER/CER (greedy + optional beam/LM).

Equivalent of /root/reference/audio8/test.py: load an a8t or converted
fairseq-CTC checkpoint, stream the validation set, accumulate CER/WER from
greedy decode, and optionally prefix-beam-search (+LM) WER.
"""
from __future__ import annotations

import logging
import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from audio8_tpu.cli.common import (add_common_model_args, apply_preset,
                                   resolve_restart, setup, topology_kwargs)
from audio8_tpu.config import AcousticConfig
from audio8_tpu.data.datasets import AudioTextLetterDataset, PrefetchLoader
from audio8_tpu.models.text import TextVectorizer, read_vocab_list
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.ops import metrics as M
from audio8_tpu.utils import Offsets, revlut, str2bool

logger = logging.getLogger("audio8_tpu.test")


def build_eval_fn(model):
    @jax.jit
    def eval_fn(params, signal, signal_lengths):
        log_probs, pad_mask = model.apply(
            {"params": params}, signal, signal_lengths, train=False, freeze=True)
        return log_probs, jnp.sum(pad_mask, axis=-1)

    return eval_fn


def run_step(index2vocab, log_probs, frame_lengths, batch, verbose=False,
             ctc_decoder=None, postproc_fn=M.postproc_letters,
             rescorer=None, bar_off=None):
    step_metrics = M.ctc_metrics(
        log_probs, batch["token_ids"], frame_lengths, index2vocab,
        postproc_fn=postproc_fn)
    step_metrics["wbeam_errors"] = 0
    if ctc_decoder is not None and rescorer is not None:
        # neural-LM n-best rescoring (ops/rescore.py): the beam proposes,
        # exact-CTC + LM + length picks
        from audio8_tpu.ops.rescore import rescore_nbest

        nbest = ctc_decoder.run(log_probs, frame_lengths,
                                n_best=ctc_decoder.beam, return_ids=True)
        for b, hyps in enumerate(nbest):
            if not hyps:
                step_metrics["wbeam_errors"] += M.decode_text_wer(
                    "", batch["token_ids"][b], index2vocab,
                    postproc_fn=postproc_fn)[0]
                continue
            best = rescore_nbest(log_probs[b], int(frame_lengths[b]), hyps,
                                 rescorer)
            text = "".join(index2vocab[t] if t != bar_off else "|"
                           for t in hyps[best])
            if verbose:
                print(text)
            werr, _ = M.decode_text_wer(text, batch["token_ids"][b],
                                        index2vocab, postproc_fn=postproc_fn)
            step_metrics["wbeam_errors"] += werr
    elif ctc_decoder is not None:
        transcriptions = ctc_decoder.run(log_probs, frame_lengths, n_best=1)
        for b, transcription in enumerate(transcriptions):
            text = "".join(transcription)
            if verbose:
                print(text)
            werr, _ = M.decode_text_wer(text, batch["token_ids"][b], index2vocab,
                                        postproc_fn=postproc_fn)
            step_metrics["wbeam_errors"] += werr
    return step_metrics


def evaluate(argv=None):
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--basedir", type=str)
    parser.add_argument("--root_dir")
    parser.add_argument("--checkpoint")
    parser.add_argument("--exported",
                        help="a8t-export CTC artifact directory: score the "
                             "serialized StableHLO forward instead of "
                             "building the model — certify an artifact's "
                             "WER on a manifest before serving it")
    parser.add_argument("--valid_dataset", type=str, help="e.g. dev-other.tsv")
    parser.add_argument("--dict_file", type=str, default="dict.ltr.txt")
    parser.add_argument("--max_sample_len", type=int, default=325_000)
    parser.add_argument("--verbose", type=str2bool, default=False)
    parser.add_argument("--valid_steps", type=int, default=40_000)
    parser.add_argument("--steps_per_update", type=int, default=100)
    parser.add_argument("--vocab_file")
    parser.add_argument("--target_tokens_per_batch", type=int, default=700_000)
    parser.add_argument("--target_type", choices=["wrd", "ltr", "bpe"], default="ltr")
    parser.add_argument("--lm")
    parser.add_argument("--beam", type=int, default=1)
    parser.add_argument("--transducer", type=str2bool, default=False,
                        help="the checkpoint is an a8t-train-transducer "
                             "model: WER/CER from the jitted transducer "
                             "search (greedy, or --beam K via "
                             "Transducer.decode_beam; --lm_rescore reranks "
                             "the beam's n-best); --lm/--device_beam stay "
                             "CTC-only")
    parser.add_argument("--pred_layers", type=int, default=2)
    parser.add_argument("--pred_dim", type=int, default=512)
    parser.add_argument("--pred_embed_dim", type=int, default=256)
    parser.add_argument("--d_joint", type=int, default=512)
    parser.add_argument("--max_decode_len", type=int, default=200)
    parser.add_argument("--max_symbols_per_frame", type=int, default=4)
    parser.add_argument("--device_beam", type=str2bool, default=False,
                        help="no-LM batch beam decode on device "
                             "(ops/beam_jax.py); wins for wide beams/"
                             "large batches, see docs/PERF.md")
    parser.add_argument("--quantize", choices=["none", "int8"], default="none",
                        help="int8: post-training weight quantization of the "
                             "Dense kernels onto the int8 MXU path "
                             "(ops/quant.py); measure the WER delta here "
                             "before serving quantized")
    parser.add_argument("--alpha", type=float, default=0.7)
    parser.add_argument("--beta", type=float, default=5.0)
    parser.add_argument("--lm_rescore",
                        help="a8t-train-lm basedir: neural-LM n-best "
                             "rescoring of the beam output (ops/rescore.py)")
    parser.add_argument("--rescore_alpha", type=float, default=0.5,
                        help="LM weight in ctc + alpha*lm + bonus*len")
    parser.add_argument("--rescore_word_bonus", type=float, default=0.0)
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
    args = apply_preset(parser.parse_args(argv))

    Offsets.remap_fairseq_ctc()
    setup()

    artifact = None
    if args.exported:
        from audio8_tpu.export import load_artifact

        if args.transducer or args.quantize != "none":
            raise ValueError("--exported eval scores the artifact as "
                             "written: --quantize is baked at export "
                             "time and the artifact's kind (meta.json) "
                             "routes itself — drop --transducer")
        artifact = load_artifact(args.exported)
        if artifact.kind == "transducer":
            vocab_list = artifact.vocab
            vocab = {v: i for i, v in enumerate(vocab_list)}
            return _evaluate_transducer_exported(
                args, revlut(vocab), TextVectorizer(vocab), artifact)
        if artifact.kind != "ctc":
            raise ValueError(
                f"{args.exported} is a {artifact.kind!r} artifact; "
                "a8t-test --exported scores CTC and transducer "
                "artifacts (embeddings run under a8t-embed)")
        vocab_list = artifact.vocab  # the artifact's vocab IS the head
        # pin the batch shapes to the artifact's entry table: the
        # valid-frame count under the reference's reshape-all pad-mask
        # downsampling depends on the PADDED length, so the certified
        # numbers equal a live eval run at the same length grid (and
        # forward() never needs to re-pad)
        args.length_buckets = sorted(
            int(e["t"]) for e in artifact.meta["entries"])
        args.max_sample_len = min(args.max_sample_len,
                                  artifact.max_samples)
    else:
        vocab_file = (args.vocab_file
                      or os.path.join(args.root_dir, args.dict_file))
        vocab_list = read_vocab_list(vocab_file)
    vocab = {v: i for i, v in enumerate(vocab_list)}
    index2vocab = revlut(vocab)
    vec = TextVectorizer(vocab)

    ctc_decoder = None
    beam_lm_key = None
    rescorer = None
    if args.transducer:
        if args.lm or args.device_beam or args.quantize != "none":
            raise ValueError("--transducer eval: --lm/--device_beam/"
                             "--quantize are CTC-path flags")
        if args.lm_rescore and args.beam <= 1:
            raise ValueError("--lm_rescore needs --beam > 1 (it reranks "
                             "the transducer beam's n-best list)")
        return _evaluate_transducer(args, vocab, index2vocab, vec)
    if args.lm_rescore and args.beam <= 1:
        raise ValueError("--lm_rescore needs --beam > 1 (it reranks the "
                         "beam's n-best list)")
    if args.beam > 1 or args.lm:
        from audio8_tpu.ops.beam import PrefixBeamSearch

        ctc_decoder = PrefixBeamSearch(
            vocab_list, alpha=args.alpha, beta=args.beta, beam=args.beam,
            lm_file=args.lm, device=args.device_beam)
        if args.lm_rescore:
            from audio8_tpu.ops.rescore import NeuralLMRescorer

            rescorer = NeuralLMRescorer(args.lm_rescore,
                                        alpha=args.rescore_alpha,
                                        word_bonus=args.rescore_word_bonus)
        if args.lm_rescore:
            beam_lm_key = f"werr_rescore_{args.beam}"
        else:
            beam_lm_key = (f"werr_lm_{args.beam}" if args.lm
                           else f"werr_{args.beam}")

    valid_set = AudioTextLetterDataset(
        os.path.join(args.root_dir, args.valid_dataset), vec,
        args.target_tokens_per_batch, args.max_sample_len,
        input_sample_rate=args.input_sample_rate,
        target_sample_rate=args.target_sample_rate,
        shuffle=False, is_infinite=False, tgt_type=args.target_type,
        pad_to_multiple=args.pad_to_multiple,
        length_grid=args.length_buckets,
        lane_align=args.lane_align)

    if artifact is not None:
        params = None

        def eval_fn(_params, signal, signal_lengths):
            return artifact.forward(np.asarray(signal),
                                    np.asarray(signal_lengths))
    else:
        dtype = jnp.bfloat16 if args.bf16 else jnp.float32
        cfg = AcousticConfig(
            num_labels=len(vocab), sample_rate=args.target_sample_rate // 1000,
            d_model=args.d_model, num_heads=args.num_heads, num_layers=args.num_layers,
            d_ff=args.d_ff, dropout=args.dropout, timestep_masking=0.0,
            channel_masking=0.0, **topology_kwargs(args))
        model = Wav2Vec2AcousticModel(config=cfg, dtype=dtype)

        checkpoint = args.checkpoint
        if not checkpoint:
            from audio8_tpu.train.checkpoint import find_latest_checkpoint
            checkpoint, _ = find_latest_checkpoint(args.basedir)
        example = jnp.zeros((1, args.pad_to_multiple), jnp.float32)
        init_params = model.init(jax.random.PRNGKey(0), example)["params"]
        params, _, _ = resolve_restart(checkpoint, init_params, ctc=True,
                                       num_layers=args.num_layers,
                                       sr=args.target_sample_rate // 1000,
                                       **topology_kwargs(args))
        if args.quantize == "int8":
            from audio8_tpu.ops.quant import quantize_model_params

            params = quantize_model_params(params)

        eval_fn = build_eval_fn(model)
    postproc = M.postproc_letters if args.target_type != "bpe" else M.postproc_bpe
    metrics = {}
    c_errors = c_total = w_errors = w_total = wlm_errors = 0
    for j, batch in enumerate(PrefetchLoader(valid_set, prefetch=4)):
        if j > args.valid_steps:
            break
        log_probs, frame_lengths = eval_fn(
            params, jnp.asarray(batch["signal"]), jnp.asarray(batch["signal_lengths"]))
        # batch-size snapping appends padding rows at the tail; score real rows
        n_real = batch.get("num_real", len(batch["signal_lengths"]))
        sm = run_step(index2vocab, np.asarray(log_probs)[:n_real],
                      np.asarray(frame_lengths)[:n_real],
                      dict(batch, token_ids=batch["token_ids"][:n_real]),
                      args.verbose, ctc_decoder, postproc,
                      rescorer=rescorer,
                      bar_off=(ctc_decoder.bar_off if ctc_decoder else None))
        c_errors += sm["c_errors"]
        w_errors += sm["w_errors"]
        wlm_errors += sm.get("wbeam_errors", 0)
        c_total += sm["c_total"]
        w_total += sm["w_total"]
        metrics["cer"] = (c_errors / max(c_total, 1)) * 100
        metrics["wer"] = (w_errors / max(w_total, 1)) * 100
        if beam_lm_key:
            metrics[beam_lm_key] = (wlm_errors / max(w_total, 1)) * 100
        metrics["step"] = j + 1
        if (j + 1) % args.steps_per_update == 0:
            logger.info(metrics)
    logger.info("Final results")
    logger.info(metrics)
    return metrics


def _evaluate_transducer_exported(args, index2vocab, vec, art):
    """Manifest WER/CER for an ``a8t-export --transducer`` artifact:
    each utterance decodes through the artifact's resumable windowed
    lattice search (serve.TransducerStreamer — the exact search serving
    runs), so the certified numbers are the numbers the artifact will
    produce in production. Greedy only (the artifact bakes the greedy
    decode); beam/LM-rescore certification uses the checkpoint path."""
    if args.beam > 1 or args.lm_rescore:
        raise ValueError(
            "exported transducer artifacts bake the greedy streaming "
            "search; --beam/--lm_rescore certification needs the "
            "checkpoint path (a8t-test --transducer)")
    from audio8_tpu.serve import TransducerStreamer

    valid_set = AudioTextLetterDataset(
        os.path.join(args.root_dir, args.valid_dataset), vec,
        args.target_tokens_per_batch, args.max_sample_len,
        input_sample_rate=args.input_sample_rate,
        target_sample_rate=args.target_sample_rate,
        shuffle=False, is_infinite=False, tgt_type=args.target_type,
        pad_to_multiple=args.pad_to_multiple,
        length_grid=args.length_buckets,
        lane_align=args.lane_align)
    sr = args.target_sample_rate
    streamer = TransducerStreamer(
        art.encode, art.decode_init, art.decode_frames, art.conv_features,
        chunk_samples=art.chunk_samples, context_samples=2 * sr,
        window_frames=art.window_frames,
        max_output_len=art.max_output_len)

    postproc = (M.postproc_letters if args.target_type != "bpe"
                else M.postproc_bpe)
    metrics = {}
    c_errors = c_total = w_errors = w_total = 0
    for j, batch in enumerate(PrefetchLoader(valid_set, prefetch=4)):
        if j > args.valid_steps:
            break
        n_real = batch.get("num_real", len(batch["signal_lengths"]))
        decoded = []
        for i in range(n_real):
            streamer.reset()
            streamer.feed(
                batch["signal"][i, :int(batch["signal_lengths"][i])])
            decoded.append(streamer.finish().tolist())
        if args.verbose:
            for ids in decoded:
                print(postproc([index2vocab[t] for t in ids]))
        sm = M.decode_metrics(decoded, batch["token_ids"][:n_real],
                              index2vocab, postproc_fn=postproc)
        c_errors += sm["c_errors"]
        w_errors += sm["w_errors"]
        c_total += sm["c_total"]
        w_total += sm["w_total"]
        metrics["cer"] = (c_errors / max(c_total, 1)) * 100
        metrics["wer"] = (w_errors / max(w_total, 1)) * 100
        metrics["step"] = j + 1
        if (j + 1) % args.steps_per_update == 0:
            logger.info(metrics)
    logger.info("Final results")
    logger.info(metrics)
    return metrics


def _evaluate_transducer(args, vocab, index2vocab, vec):
    """The eval loop for an RNN-T checkpoint: jitted transducer search
    (greedy, or beam 1-best) + decode_metrics WER/CER — the transducer
    analog of the CTC flow above, behind the same flag surface."""
    import functools

    from audio8_tpu.config import TransducerConfig
    from audio8_tpu.models.transducer import Transducer

    valid_set = AudioTextLetterDataset(
        os.path.join(args.root_dir, args.valid_dataset), vec,
        args.target_tokens_per_batch, args.max_sample_len,
        input_sample_rate=args.input_sample_rate,
        target_sample_rate=args.target_sample_rate,
        shuffle=False, is_infinite=False, tgt_type=args.target_type,
        pad_to_multiple=args.pad_to_multiple,
        length_grid=args.length_buckets,
        lane_align=args.lane_align)

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg = TransducerConfig(
        vocab_size=len(vocab), sample_rate=args.target_sample_rate // 1000,
        d_model=args.d_model, num_heads=args.num_heads,
        num_layers=args.num_layers, d_ff=args.d_ff,
        timestep_masking=0.0, channel_masking=0.0,
        pred_layers=args.pred_layers, pred_dim=args.pred_dim,
        pred_embed_dim=args.pred_embed_dim, d_joint=args.d_joint,
        **topology_kwargs(args))
    model = Transducer(config=cfg, dtype=dtype)

    checkpoint = args.checkpoint
    if not checkpoint:
        from audio8_tpu.train.checkpoint import find_latest_checkpoint
        checkpoint, _ = find_latest_checkpoint(args.basedir)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, args.pad_to_multiple), jnp.float32),
                      jnp.asarray([args.pad_to_multiple], jnp.int32),
                      jnp.zeros((1, 8), jnp.int32))["params"]
    params, _, _ = resolve_restart(checkpoint, init, ctc=True,
                                   num_layers=args.num_layers,
                                   sr=args.target_sample_rate // 1000,
                                   **topology_kwargs(args))
    params = jax.device_put(params)

    rescorer = None
    if args.lm_rescore:
        from audio8_tpu.ops.rescore import (NeuralLMRescorer,
                                            rescore_transducer_nbest)

        rescorer = NeuralLMRescorer(args.lm_rescore,
                                    alpha=args.rescore_alpha,
                                    word_bonus=args.rescore_word_bonus)

    @functools.partial(jax.jit, static_argnames=("k",))
    def _decode(p, signal, lengths, k):
        if k > 1:
            return model.apply(
                {"params": p}, signal, lengths, k, args.max_decode_len,
                args.max_symbols_per_frame, method=Transducer.decode_beam)
        toks, n = model.apply({"params": p}, signal, lengths,
                              args.max_decode_len,
                              args.max_symbols_per_frame,
                              method=Transducer.decode)
        return toks[:, None], n[:, None], jnp.zeros_like(n, jnp.float32
                                                         )[:, None]

    postproc = (M.postproc_letters if args.target_type != "bpe"
                else M.postproc_bpe)
    metrics = {}
    c_errors = c_total = w_errors = w_total = 0
    for j, batch in enumerate(PrefetchLoader(valid_set, prefetch=4)):
        if j > args.valid_steps:
            break
        toks, lens, scores = _decode(params, jnp.asarray(batch["signal"]),
                                     jnp.asarray(batch["signal_lengths"]),
                                     args.beam)
        n_real = batch.get("num_real", len(batch["signal_lengths"]))
        toks, lens, scores = (np.asarray(toks)[:n_real],
                              np.asarray(lens)[:n_real],
                              np.asarray(scores)[:n_real])
        if rescorer is not None:
            decoded = []
            for i in range(n_real):
                live = scores[i] > -1e20
                hyps = [toks[i, kk, :lens[i, kk]].tolist()
                        for kk in range(toks.shape[1]) if live[kk]]
                best = rescore_transducer_nbest(scores[i][live], hyps,
                                                rescorer)
                decoded.append(hyps[best] if hyps else [])
        else:
            decoded = [toks[i, 0, :lens[i, 0]].tolist()
                       for i in range(n_real)]
        if args.verbose:
            for ids in decoded:
                print(postproc([index2vocab[t] for t in ids]))
        sm = M.decode_metrics(decoded, batch["token_ids"][:n_real],
                              index2vocab, postproc_fn=postproc)
        c_errors += sm["c_errors"]
        w_errors += sm["w_errors"]
        c_total += sm["c_total"]
        w_total += sm["w_total"]
        metrics["cer"] = (c_errors / max(c_total, 1)) * 100
        metrics["wer"] = (w_errors / max(w_total, 1)) * 100
        metrics["step"] = j + 1
        if (j + 1) % args.steps_per_update == 0:
            logger.info(metrics)
    logger.info("Final results")
    logger.info(metrics)
    return metrics


def main():
    evaluate()


if __name__ == "__main__":
    main()
