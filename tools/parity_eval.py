"""Real-checkpoint parity harness: fairseq wav2vec2 .pt vs the JAX model.

Takes a fairseq CTC checkpoint and (optionally) a LibriSpeech-format
manifest, converts the weights, and reports

1. per-layer activation deltas between the torch replica
   (audio8_tpu/models/torch_ref.py, the fairseq forward oracle) and the
   JAX model with the SAME converted weights, on probe utterances;
2. side-by-side greedy WER/CER over the manifest: the JAX eval pipeline
   (cli/test.py equivalent) vs the torch replica on identical audio.

Anchors: /root/reference/audio8/test.py:26-171 (eval pipeline),
convert_wav2vec2_checkpoint.py:59-60 (all keys must map).

One-command recipes:

  # real checkpoint + LibriSpeech manifest
  python tools/parity_eval.py --checkpoint wav2vec2_base_960h.pt \\
      --root_dir /data/librispeech --valid_dataset dev-clean.tsv \\
      --num_heads 12 --valid_steps 200

  # no data needed: generate a synthetic checkpoint+corpus and run e2e
  python tools/parity_eval.py --synthetic /tmp/parity_demo
"""
from __future__ import annotations

import json
import logging
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logger = logging.getLogger("parity_eval")


def parse_args(argv=None):
    p = ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", help="fairseq .pt (CTC-finetuned)")
    p.add_argument("--hf", metavar="DIR",
                   help="HF transformers Wav2Vec2ForCTC save_pretrained "
                        "dir; the live transformers forward is the oracle")
    p.add_argument("--root_dir", help="manifest directory (LibriSpeech format)")
    p.add_argument("--valid_dataset", help="e.g. dev-clean.tsv")
    p.add_argument("--dict_file", default="dict.ltr.txt")
    p.add_argument("--num_heads", type=int, default=12,
                   help="attention heads (not recoverable from weights)")
    p.add_argument("--sample_rate", type=int, default=16)
    p.add_argument("--probe_utterances", type=int, default=3,
                   help="utterances for per-layer activation deltas")
    p.add_argument("--valid_steps", type=int, default=100,
                   help="max eval batches for the WER comparison")
    p.add_argument("--atol", type=float, default=5e-3,
                   help="fail threshold for the worst activation delta")
    p.add_argument("--synthetic", metavar="DIR",
                   help="generate a synthetic checkpoint+corpus in DIR and "
                        "run the full harness against it")
    p.add_argument("--family", default="fairseq",
                   choices=["fairseq", "wav2vec2", "wav2vec2_stable_ln",
                            "hubert", "data2vec_audio", "wavlm",
                            "conformer_rotary", "conformer_relative"],
                   help="--synthetic model family: 'fairseq' (default) "
                        "fabricates a fairseq wav2vec2 .pt; the rest build "
                        "a tiny random HF model of that family "
                        "(tools/make_golden_fixtures.families) and run the "
                        "live-transformers-oracle --hf flow, so every zoo "
                        "topology is checkable through this CLI eval path")
    p.add_argument("--json_out", help="write the report as JSON here")
    p.add_argument("--backend", default="cpu", choices=["cpu", "default"],
                   help="parity needs exact math: 'cpu' (default) forces "
                        "the CPU backend (TPU's bf16-input matmul default "
                        "adds ~1e-1 activation noise); 'default' keeps the "
                        "platform backend")
    return p.parse_args(argv)


def make_corpus(outdir: str):
    """6-utterance synthetic letter corpus; returns the letter list."""
    from scipy.io import wavfile

    os.makedirs(os.path.join(outdir, "audio"), exist_ok=True)
    rng = np.random.default_rng(0)
    words = ["CAT", "DOG", "GO ON", "HI", "SO SO", "NO WAY"]
    letters = sorted(set("".join(w.replace(" ", "") for w in words)) | {"|"})
    with open(os.path.join(outdir, "dict.ltr.txt"), "w") as df:
        for ch in letters:
            df.write(f"{ch} 1\n")
    with open(os.path.join(outdir, "dev.tsv"), "w") as tf, \
         open(os.path.join(outdir, "dev.ltr"), "w") as lf:
        tf.write(os.path.join(outdir, "audio") + "\n")
        for i, w in enumerate(words):
            n = 8000 + 2000 * i
            wavfile.write(os.path.join(outdir, "audio", f"u{i}.wav"), 16000,
                          (rng.normal(size=n) * 5000).astype(np.int16))
            tf.write(f"u{i}.wav\t{n}\n")
            lf.write(" ".join(list(w.replace(" ", "|"))) + " |\n")
    return letters


def make_synthetic_hf(outdir: str, family: str):
    """Tiny random HF model of ``family`` + corpus; returns the
    save_pretrained dir for the --hf oracle flow."""
    import torch

    try:
        from tools.make_golden_fixtures import families
    except ImportError:  # invoked as `python tools/parity_eval.py`
        from make_golden_fixtures import families

    letters = make_corpus(outdir)
    torch.manual_seed(0)
    model = families(vocab_size=len(letters) + 4)[family]().eval()
    with torch.no_grad():
        # decisive head (like make_synthetic's): HF's 0.02-std init gives
        # near-flat logits whose argmax flips on float noise — not what
        # this harness measures
        model.lm_head.weight.mul_(20.0)
        model.lm_head.bias.normal_(0.0, 2.0)
    hf_dir = os.path.join(outdir, "hf_model")
    model.save_pretrained(hf_dir)
    return hf_dir


def make_synthetic(outdir: str, d=64, h=4, l=2):
    """Random fairseq-format CTC .pt + 6-utterance corpus."""
    import torch

    from audio8_tpu.models.torch_ref import make_fairseq_state

    letters = make_corpus(outdir)
    rng = np.random.default_rng(0)
    state = make_fairseq_state(rng, d=d, h=h, l=l,
                               prefix="w2v_encoder.w2v_model.")
    v = len(letters) + 4  # specials
    # decisive head: random-but-flat log-probs would make greedy argmax
    # flip on float noise, which is not what this harness measures
    state["w2v_encoder.proj.weight"] = rng.normal(size=(v, d)).astype(np.float32)
    state["w2v_encoder.proj.bias"] = rng.normal(size=v).astype(np.float32)
    ckpt = os.path.join(outdir, "synthetic_ctc.pt")
    torch.save({"model": {k: torch.from_numpy(np.asarray(s))
                          for k, s in state.items()}}, ckpt)
    return ckpt


def jax_taps(model, params, x):
    """(name, activation) pairs from the JAX model matching torch_ref's tap
    names, via flax capture_intermediates."""
    import jax.numpy as jnp

    out, mods = model.apply({"params": params}, jnp.asarray(x),
                            capture_intermediates=True)
    log_probs = np.asarray(out[0])
    flat = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        else:
            flat[path] = tree

    walk(mods["intermediates"], ())
    taps = {"log_probs": log_probs}
    for path, val in flat.items():
        name = "/".join(path)
        arrs = val if isinstance(val, tuple) else (val,)
        # transformer layer outputs: .../transformer/layer_{i}/__call__
        parts = [p for p in path if p.startswith("layer_")]
        if parts and "__call__" in path:
            out0 = arrs[0]
            if isinstance(out0, tuple):
                out0 = out0[0]
            taps[parts[-1]] = np.asarray(out0, np.float32)
    return taps


def activation_deltas(oracle, model, params, probes):
    """``oracle(x, taps)`` runs the reference forward, appending
    (name, value) activation pairs to ``taps``."""
    rows = []
    for x in probes:
        t_taps: list = []
        oracle(x, taps=t_taps)
        j_taps = jax_taps(model, params, x)
        for name, t_val in t_taps:
            if name not in j_taps:
                continue
            j_val = j_taps[name]
            if j_val.shape != t_val.shape:
                rows.append({"tap": name, "max_abs_delta": float("nan"),
                             "note": f"shape {j_val.shape} vs {t_val.shape}"})
                continue
            rows.append({"tap": name,
                         "max_abs_delta": float(np.abs(j_val - t_val).max())})
    # worst delta per tap across probes
    worst = {}
    for r in rows:
        w = worst.setdefault(r["tap"], r)
        if r["max_abs_delta"] >= w["max_abs_delta"]:
            worst[r["tap"]] = r
    return list(worst.values())


def wer_side_by_side(oracle, model, params, valid_set, index2vocab,
                     valid_steps):
    """Greedy WER/CER, JAX pipeline vs the reference oracle, same audio
    (B=1 rows so the no-padding oracle sees exact lengths). Returns
    (per-side metrics, argmax-disagreement stats): a disagreeing frame
    is 'unexplained' unless the oracle's top-2 margin there is within
    2x the local log-prob delta (float-noise tie)."""
    import jax
    import jax.numpy as jnp

    from audio8_tpu.ops import metrics as M

    @jax.jit
    def eval_fn(p, signal, lengths):
        lp, pad_mask = model.apply({"params": p}, signal, lengths,
                                   train=False, freeze=True)
        return lp, jnp.sum(pad_mask, axis=-1)

    acc = {"jax": [0, 0, 0, 0], "torch": [0, 0, 0, 0]}  # ce, ct, we, wt
    # Greedy transcripts computed from log-probs that differ by at most
    # dmax can only disagree at frames whose top-2 margin is < 2*dmax —
    # a theorem, unlike exact metric equality (an argmax near-tie flips
    # on float noise). Track every disagreeing frame and whether the
    # local margin explains it.
    diffs = {"total": 0, "unexplained": 0, "max_margin": 0.0}
    n = 0
    for batch in iter(valid_set):
        if n >= valid_steps:
            break
        n_real = batch.get("num_real", len(batch["signal_lengths"]))
        for i in range(n_real):
            if n >= valid_steps:
                break
            n += 1
            length = int(batch["signal_lengths"][i])
            x = batch["signal"][i:i + 1]
            gold = batch["token_ids"][i:i + 1]
            lp_j, fl_j = eval_fn(params, jnp.asarray(x),
                                 jnp.asarray([length], jnp.int32))
            frames_j = np.argmax(np.asarray(lp_j), -1).astype(np.int32)
            sm = M.ctc_metrics(frames_j, gold, np.asarray(fl_j), index2vocab)
            for j, k in enumerate(["c_errors", "c_total", "w_errors", "w_total"]):
                acc["jax"][j] += sm[k]
            lp_t = oracle(x[:, :length])
            frames_t = np.argmax(lp_t, -1).astype(np.int32)
            # score the replica over the same frame count the eval pipeline
            # uses (the reference's reshape-all downsampling under-counts by
            # up to one frame vs the exact conv output; parity means
            # comparing like with like)
            fl_t = min(int(np.asarray(fl_j)[0]), lp_t.shape[1])
            sm = M.ctc_metrics(frames_t, gold,
                               np.asarray([fl_t]), index2vocab)
            for j, k in enumerate(["c_errors", "c_total", "w_errors", "w_total"]):
                acc["torch"][j] += sm[k]
            lpj = np.asarray(lp_j, np.float64)[0, :fl_t]
            lpt = np.asarray(lp_t, np.float64)[0, :fl_t]
            for f in np.nonzero(lpj.argmax(-1) != lpt.argmax(-1))[0]:
                dmax = float(np.abs(lpj[f] - lpt[f]).max())
                top2 = np.sort(lpt[f])[-2:]
                margin = float(top2[1] - top2[0])
                diffs["total"] += 1
                diffs["max_margin"] = max(diffs["max_margin"], margin)
                if margin > 2.0 * dmax + 1e-9:
                    diffs["unexplained"] += 1
    out = {}
    for side, (ce, ct, we, wt) in acc.items():
        out[side] = {"cer": 100.0 * ce / max(ct, 1),
                     "wer": 100.0 * we / max(wt, 1), "utterances": n,
                     "ref_chars": int(ct), "ref_words": int(wt)}
    return out, diffs


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from audio8_tpu.config import CONV_FEATURES, AcousticConfig
    from audio8_tpu.data.datasets import AudioTextLetterDataset
    from audio8_tpu.models.convert import convert_ctc_state, merge_params
    from audio8_tpu.models.torch_ref import infer_dims
    from audio8_tpu.models.text import TextVectorizer, read_vocab_list
    from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
    from audio8_tpu.utils import Offsets, revlut

    Offsets.remap_fairseq_ctc()

    if args.synthetic:
        if args.family == "fairseq":
            args.checkpoint = make_synthetic(args.synthetic)
        else:
            args.hf = make_synthetic_hf(args.synthetic, args.family)
        args.root_dir = args.synthetic
        args.valid_dataset = "dev.tsv"
        args.num_heads = 4
    if not args.checkpoint and not args.hf:
        raise SystemExit("--checkpoint, --hf or --synthetic required")

    fx = CONV_FEATURES[args.sample_rate]
    if args.hf:
        # oracle = the live transformers implementation itself
        import transformers

        from audio8_tpu.models.convert_hf import load_hf_dir

        # AutoModelForCTC resolves the family from config.json (Wav2Vec2,
        # HuBERT, Data2VecAudio, WavLM); the converter reports the matching
        # topology kwargs for our model
        from audio8_tpu.models.convert_hf import acoustic_config_from_hf

        hf_model = transformers.AutoModelForCTC.from_pretrained(args.hf).eval()
        hc = hf_model.config
        params, report = load_hf_dir(args.hf, ctc=True)
        if report["missing"] or report["unexpected"]:
            raise SystemExit(f"unmapped keys: {report}")
        dims = {"d_model": hc.hidden_size, "num_layers": hc.num_hidden_layers,
                "d_ff": hc.intermediate_size, "num_labels": hc.vocab_size}
        args.num_heads = hc.num_attention_heads
        args.checkpoint = args.hf
        logger.info("HF checkpoint dims: %s topology: %s", dims,
                    report["topology"])
        topo = dict(report["topology"])
        cfg = acoustic_config_from_hf(hc.to_dict(), topo)

        def oracle(x, taps=None):
            with torch.no_grad():
                out = hf_model(torch.from_numpy(np.asarray(x, np.float32)),
                               output_hidden_states=taps is not None)
            lp = torch.log_softmax(out.logits, -1).numpy()
            if taps is not None:
                taps.append(("log_probs", lp))
                hs = out.hidden_states  # hs[i] = input to layer i
                # hs[i+1] == output of layer i, except under stable-LN the
                # final entry has the post-stack LayerNorm applied
                last = len(hs) - (2 if topo["pre_norm"] else 1)
                for i in range(last):
                    taps.append((f"layer_{i}", hs[i + 1].numpy()))
            return lp
    else:
        raw = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
        state = {k: np.asarray(v) for k, v in raw["model"].items()}
        dims = infer_dims(state, prefix="w2v_encoder.w2v_model.")
        logger.info("checkpoint dims: %s", dims)

        params, report = convert_ctc_state(state, num_layers=dims["num_layers"],
                                           num_fx_layers=len(fx))
        if report["missing"] or report["unexpected"]:
            # the reference converter raises on unmapped keys
            # (convert_wav2vec2_checkpoint.py:59-60)
            raise SystemExit(f"unmapped keys: {report}")

        cfg = AcousticConfig(
            num_labels=dims["num_labels"], sample_rate=args.sample_rate,
            d_model=dims["d_model"], num_heads=args.num_heads,
            num_layers=dims["num_layers"], d_ff=dims["d_ff"],
            dropout=0.0, timestep_masking=0.0, channel_masking=0.0)

        from audio8_tpu.models.torch_ref import ctc_log_probs

        def oracle(x, taps=None):
            return ctc_log_probs(state, x, num_heads=args.num_heads, fx=fx,
                                 taps=taps)
    model = Wav2Vec2AcousticModel(config=cfg)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 4000), jnp.float32))["params"]
    params = merge_params(init, params)

    # probe utterances: first N manifest files, else noise
    probes = []
    valid_set = None
    index2vocab = None
    if args.root_dir and args.valid_dataset:
        vocab_list = read_vocab_list(os.path.join(args.root_dir, args.dict_file))
        vocab = {v: i for i, v in enumerate(vocab_list)}
        index2vocab = revlut(vocab)
        valid_set = AudioTextLetterDataset(
            os.path.join(args.root_dir, args.valid_dataset),
            TextVectorizer(vocab), 320_000, shuffle=False, is_infinite=False,
            pad_to_multiple=4000)
        for b in iter(valid_set):
            for i in range(b.get("num_real", 1)):
                if len(probes) >= args.probe_utterances:
                    break
                length = int(b["signal_lengths"][i])
                probes.append(b["signal"][i:i + 1, :length])
            break
    while len(probes) < args.probe_utterances:
        rng = np.random.default_rng(len(probes))
        probes.append(rng.normal(size=(1, 16000)).astype(np.float32))

    deltas = activation_deltas(oracle, model, params, probes)
    report_out = {"checkpoint": args.checkpoint, "dims": dims,
                  "activation_deltas": deltas}
    # nan-aware: a NaN delta (e.g. a tap that failed to compare) must make
    # the run fail, not be silently skipped by Python's max ordering
    all_deltas = [d["max_abs_delta"] for d in deltas]
    if not all_deltas or any(not np.isfinite(v) for v in all_deltas):
        worst = float("nan")
    else:
        worst = max(all_deltas)
    logger.info("per-layer activation deltas (worst over %d probes):",
                len(probes))
    for d in sorted(deltas, key=lambda r: r["tap"]):
        logger.info("  %-16s max|Δ| = %.3e %s", d["tap"], d["max_abs_delta"],
                    d.get("note", ""))

    if valid_set is not None:
        wers, diffs = wer_side_by_side(oracle, model, params, valid_set,
                                       index2vocab, args.valid_steps)
        report_out["wer"] = wers
        report_out["argmax_diffs"] = diffs
        logger.info("greedy WER side-by-side: %s", json.dumps(wers))
        logger.info("frame argmax disagreements: %s (unexplained = margin "
                    "beyond 2x the local log-prob delta)", json.dumps(diffs))
        dw = abs(wers["jax"]["wer"] - wers["torch"]["wer"])
        report_out["wer_delta"] = dw
        # theorem bound: one explained tie-flip changes the collapsed hyp
        # by at most 2 edits at either level (a mid-run flip can split a
        # run, "AAA"->"ABA"), so the aggregate metric can move at most
        # 200 * flips / ref_total points; with zero flips, exactly 0
        report_out["wer_delta_bound"] = (
            200.0 * diffs["total"] / max(wers["jax"]["ref_words"], 1) + 1e-9)

    ok = np.isfinite(worst) and worst <= args.atol
    if report_out.get("argmax_diffs", {}).get("unexplained", 0):
        ok = False
    report_out["ok"] = bool(
        ok and report_out.get("wer_delta", 0.0)
        <= report_out.get("wer_delta_bound", 0.5))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report_out, f, indent=2)
    print(json.dumps({"ok": report_out["ok"], "worst_activation_delta": worst,
                      "wer": report_out.get("wer")}))
    return 0 if report_out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
