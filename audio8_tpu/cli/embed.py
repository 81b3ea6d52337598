"""Utterance-embedding CLI: audio -> one vector per file.

Beyond the reference (which trains pooled encoders for paired
pretraining but ships no embedding inference path): loads any encoder
checkpoint in the zoo (a8t pretrain/CTC/paired tree, fairseq ``.pt``,
or an HF ``save_pretrained`` dir), runs the pooled utterance encoder
(reduction menu: ``sha``/``sha_max``/``sha_mean``/``2ha*``/``max``),
and writes one L2-normalized embedding per manifest row — the feature
extraction step of speaker verification / audio retrieval with WavLM-
style encoders.

Outputs ``<out>.npy`` (N, D) plus ``<out>.tsv`` (file\\tindex). With
``--trials`` (``enroll_path\\ttest_path\\tlabel`` rows) it instead
scores cosine similarity per pair and reports EER — the standard
speaker-verification measurement.

Batches pad to a static length grid (one compiled program per grid
entry), the same lane-aligned shapes the rest of the framework uses.
"""
from __future__ import annotations

import logging
import os
from argparse import ArgumentParser

import numpy as np

logger = logging.getLogger("audio8_tpu.embed")


def parse_args(argv=None):
    from audio8_tpu.cli.common import add_common_model_args, apply_preset

    p = ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint",
                   help="a8t checkpoint, fairseq .pt, or HF dir")
    p.add_argument("--exported",
                   help="a8t-export --pooled artifact directory: run the "
                        "serialized embedding forward instead of building "
                        "the model from a checkpoint")
    p.add_argument("--root_dir", required=True)
    p.add_argument("--dataset", default="test.tsv",
                   help="TSV manifest (dir header + file\\tsamples rows)")
    p.add_argument("--output", default="embeddings",
                   help="writes <output>.npy + <output>.tsv")
    p.add_argument("--trials",
                   help="optional trial list: enroll\\ttest\\tlabel rows "
                        "(paths relative to the manifest audio dir); "
                        "reports cosine-score EER instead of writing "
                        "embeddings")
    p.add_argument("--reduction_type", default="mean",
                   choices=["mean", "max", "sha", "sha_max", "sha_mean",
                            "2ha", "2ha_max", "2ha_mean"],
                   help="utterance pooling; 'mean'/'max' need no pooled "
                        "head params (use these for raw pretrained/CTC "
                        "checkpoints)")
    p.add_argument("--max_sample_len", type=int, default=325_000)
    p.add_argument("--batch", type=int, default=8)
    add_common_model_args(p)
    args = apply_preset(p.parse_args(argv))
    if not args.exported and not args.checkpoint:
        raise SystemExit("--checkpoint is required "
                         "(or pass an --exported artifact)")
    return args


def build_embedder(args):
    """-> (embed(files) -> (N, D) f32 unit vectors, audio_dir-aware reader)."""
    import jax
    import jax.numpy as jnp

    from audio8_tpu.cli.common import resolve_restart, topology_kwargs
    from audio8_tpu.config import PooledConfig
    from audio8_tpu.data.audio import SoundfileAudioReader
    from audio8_tpu.models.wav2vec2 import Wav2Vec2PooledEncoder

    def make_embed(run, pad_target):
        """The shared read/pad/batch loop: ``run(sig, lens) -> (B, D)``
        unit vectors, ``pad_target(max_len) -> padded T``."""
        reader = SoundfileAudioReader()

        def embed(paths):
            out = []
            for lo in range(0, len(paths), args.batch):
                chunk = paths[lo:lo + args.batch]
                audios = [reader.read(p, args.max_sample_len).squeeze()
                          for p in chunk]
                t = pad_target(max(len(a) for a in audios))
                sig = np.zeros((len(chunk), t), np.float32)
                lens = np.zeros(len(chunk), np.int32)
                for i, a in enumerate(audios):
                    sig[i, :len(a)] = a
                    lens[i] = len(a)
                out.append(np.asarray(run(sig, lens)))
            return (np.concatenate(out) if out
                    else np.zeros((0, 1), np.float32))

        return embed

    if args.exported:
        from audio8_tpu.export import load_artifact

        art = load_artifact(args.exported)
        if art.kind != "embed":
            raise SystemExit(f"{args.exported} is a {art.kind!r} "
                             "artifact, not an embed one "
                             "(a8t-export --pooled)")
        # utterances must fit an exported window; the artifact pads the
        # rest of the way to its entry table itself
        args.max_sample_len = min(args.max_sample_len, art.max_samples)
        return make_embed(art.run, lambda n: n)

    cfg = PooledConfig(
        d_model=args.d_model, num_heads=args.num_heads,
        num_layers=args.num_layers, d_ff=args.d_ff, dropout=0.0,
        timestep_masking=0.0, channel_masking=0.0, freeze_fx=False,
        reduction_type=args.reduction_type, **topology_kwargs(args))
    model = Wav2Vec2PooledEncoder(config=cfg)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 16000), jnp.float32),
                      jnp.asarray([16000]))["params"]
    params, _, _ = resolve_restart(args.checkpoint, init,
                                   num_layers=args.num_layers,
                                   **topology_kwargs(args))

    # params as a jit argument (closure constants overflow the axon
    # remote-compile relay at real model sizes — see cli/transcribe.py)
    params = jax.device_put(params)

    @jax.jit
    def _run(p, signal, lengths):
        emb = model.apply({"params": p}, signal, lengths, freeze=False)
        emb = emb.astype(jnp.float32)
        return emb * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(emb * emb, -1, keepdims=True), 1e-12))

    # pad to whole seconds (bounded program count)
    return make_embed(
        lambda sig, lens: _run(params, jnp.asarray(sig), jnp.asarray(lens)),
        lambda n: max(16_000, ((n + 15_999) // 16_000) * 16_000))


def compute_eer(scores: np.ndarray, labels: np.ndarray) -> float:
    """Equal error rate of cosine scores vs binary labels."""
    order = np.argsort(-scores)
    labels = labels[order].astype(bool)
    pos = max(int(labels.sum()), 1)
    neg = max(int((~labels).sum()), 1)
    tp = np.cumsum(labels)
    fp = np.cumsum(~labels)
    fnr = 1.0 - tp / pos
    fpr = fp / neg
    i = int(np.argmin(np.abs(fnr - fpr)))
    return float((fnr[i] + fpr[i]) / 2.0)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    manifest = os.path.join(args.root_dir, args.dataset)
    with open(manifest) as f:
        audio_dir = f.readline().strip()
        rows = [line.split("\t")[0] for line in f if line.strip()]
    embed = build_embedder(args)

    if args.trials:
        pairs = []
        with open(args.trials) as f:
            for line in f:
                enroll, test, label = line.split()
                pairs.append((enroll, test, int(label)))
        uniq = sorted({p for e, t, _ in pairs for p in (e, t)})
        vecs = embed([os.path.join(audio_dir, p) for p in uniq])
        idx = {p: i for i, p in enumerate(uniq)}
        scores = np.array([float(vecs[idx[e]] @ vecs[idx[t]])
                           for e, t, _ in pairs])
        labels = np.array([l for _, _, l in pairs])
        eer = compute_eer(scores, labels)
        logger.info("trials %d, EER %.2f%%", len(pairs), eer * 100)
        print(f"eer {eer:.4f}")
        return 0

    vecs = embed([os.path.join(audio_dir, r) for r in rows])
    np.save(args.output + ".npy", vecs)
    with open(args.output + ".tsv", "w") as f:
        for i, r in enumerate(rows):
            f.write(f"{r}\t{i}\n")
    logger.info("%d embeddings (dim %d) -> %s.npy", len(vecs),
                vecs.shape[-1] if len(vecs) else 0, args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
