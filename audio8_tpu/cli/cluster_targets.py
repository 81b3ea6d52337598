"""Generate HuBERT pretraining targets: MFCC k-means cluster ids.

Reads TSV manifests (the reference's format: dir header +
``file\\tnum_samples`` rows, /root/reference/audio8/data.py:168-196),
computes conv-grid-aligned MFCCs (data/mfcc.py), fits k-means on a frame
subsample of the FIRST manifest, and writes one ``.km`` file per
manifest (one line per utterance: space-separated cluster ids, one id
per encoder frame — the fairseq HuBERT label format) plus the centroids
as ``.npy`` for later assignment runs.

Iteration 2+ (HuBERT refines targets by re-clustering a trained model's
intermediate features, arXiv 2106.07447 §3.2): pass ``--checkpoint``
(a8t HuBERT/wav2vec2 checkpoint, fairseq .pt, or HF dir) and
``--feature_layer N`` to cluster transformer layer-N outputs instead of
MFCCs — frames stay conv-grid-aligned by construction.

Usage:
  a8t-cluster-targets --root_dir /data --manifests train.tsv valid.tsv \\
      --num_clusters 100
  a8t-pretrain-hubert ... --train_dataset train.tsv  # picks up train.km
  # iteration 2: 500 clusters over layer-6 features of the iteration-1 run
  a8t-cluster-targets --root_dir /data --manifests train.tsv valid.tsv \\
      --num_clusters 500 --checkpoint runs/hubert-it1 --feature_layer 6
"""
from __future__ import annotations

import logging
import os
from argparse import ArgumentParser

import numpy as np

from audio8_tpu.data.audio import SoundfileAudioReader
from audio8_tpu.data.mfcc import assign_clusters, kmeans, mfcc

logger = logging.getLogger("audio8_tpu.cluster")


def read_manifest(tsv: str):
    with open(tsv) as f:
        directory = f.readline().strip()
        rows = [line.split("\t")[0] for line in f if line.strip()]
    return directory, rows


def make_model_featurizer(args):
    """audio (T,) -> (frames, d_model) transformer layer-N features of a
    restored model (HuBERT iteration 2+).

    Audio pads to a sample grid (bounded compile count); the frame count
    is sliced back to the true conv output length, and attention is
    pad-masked via input_lengths, so features stay aligned with the
    MFCC/conv grid.
    """
    import jax
    import jax.numpy as jnp

    from audio8_tpu.cli.common import resolve_restart, topology_kwargs
    from audio8_tpu.config import (CONV_FEATURES, EncoderConfig,
                                   conv_output_length)
    from audio8_tpu.models.wav2vec2 import Wav2Vec2Encoder

    # head-free encoder: HuBERT/wav2vec2 pretrain trees share its layout,
    # so any source checkpoint warm-starts it (extra head keys drop in
    # merge) regardless of the source run's num_clusters/final_dim
    cfg = EncoderConfig(
        d_model=args.d_model, num_heads=args.num_heads,
        num_layers=args.num_layers, d_ff=args.d_ff, dropout=0.0,
        timestep_masking=0.0, channel_masking=0.0, freeze_fx=False,
        **topology_kwargs(args))
    model = Wav2Vec2Encoder(config=cfg)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 16000), jnp.float32))["params"]
    params, _, _ = resolve_restart(args.checkpoint, init,
                                   num_layers=args.num_layers,
                                   **topology_kwargs(args))
    layer = f"layer_{args.feature_layer - 1}"  # layer-N output, 1-based
    is_tap = lambda mdl, method: (method == "__call__"
                                  and getattr(mdl, "name", None) == layer)

    # params as a jit argument (closure constants overflow the axon
    # remote-compile relay at real model sizes — see cli/transcribe.py)
    params = jax.device_put(params)

    @jax.jit
    def _run(p, signal, lengths):
        _, inter = model.apply({"params": p}, signal, lengths,
                               capture_intermediates=is_tap,
                               mutable=["intermediates"])
        return inter["intermediates"]["encoder"]["transformer"][layer][
            "__call__"][0]

    def run(signal, lengths):
        return _run(params, signal, lengths)

    conv = CONV_FEATURES[args.target_sample_rate // 1000]

    def featurize(x):
        n = len(x)
        pad = (n + 15_999) // 16_000 * 16_000
        sig = jnp.zeros((1, pad), jnp.float32).at[0, :n].set(
            jnp.asarray(x, jnp.float32))
        feats = run(sig, jnp.asarray([n], jnp.int32))
        return np.asarray(feats[0, :conv_output_length(n, conv)], np.float32)

    return featurize


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = ArgumentParser(description=__doc__)
    p.add_argument("--root_dir", required=True)
    p.add_argument("--manifests", nargs="+", required=True,
                   help="TSV manifests; k-means is fit on the first")
    p.add_argument("--num_clusters", type=int, default=100,
                   help="HuBERT iteration-1 default (arXiv 2106.07447)")
    p.add_argument("--fit_frames", type=int, default=200_000,
                   help="frame subsample for the k-means fit")
    p.add_argument("--kmeans_iters", type=int, default=20)
    p.add_argument("--centroids", help="reuse fitted centroids (.npy) "
                                       "instead of fitting")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint",
                   help="cluster a trained model's features instead of "
                        "MFCCs (HuBERT iteration 2+): a8t checkpoint, "
                        "fairseq .pt, or HF dir")
    p.add_argument("--feature_layer", type=int, default=6,
                   help="1-based transformer layer whose output is "
                        "clustered (HuBERT it-2 uses 6 of a base model)")
    from audio8_tpu.cli.common import add_common_model_args, apply_preset

    add_common_model_args(p)
    args = apply_preset(p.parse_args(argv))

    reader = SoundfileAudioReader()
    rng = np.random.default_rng(args.seed)
    featurize = (make_model_featurizer(args) if args.checkpoint
                 else (lambda x: mfcc(x)))
    manifests = [os.path.join(args.root_dir, m) for m in args.manifests]

    if args.centroids:
        centroids = np.load(args.centroids)
        logger.info("loaded %s centroids from %s", len(centroids),
                    args.centroids)
    else:
        directory, rows = read_manifest(manifests[0])
        sample: list = []
        per_file = max(1, args.fit_frames // max(len(rows), 1))
        for name in rows:
            feats = featurize(
                reader.read(os.path.join(directory, name)).squeeze())
            if not len(feats):
                continue
            take = min(per_file, len(feats))
            sample.append(feats[rng.choice(len(feats), take, replace=False)])
        frames = np.concatenate(sample)
        logger.info("fitting k-means: %d clusters on %d frames",
                    args.num_clusters, len(frames))
        centroids = kmeans(frames, args.num_clusters,
                           n_iter=args.kmeans_iters, seed=args.seed)
        cpath = manifests[0].replace(".tsv", ".centroids.npy")
        np.save(cpath, centroids)
        logger.info("centroids -> %s", cpath)

    for tsv in manifests:
        directory, rows = read_manifest(tsv)
        km_path = tsv.replace(".tsv", ".km")
        with open(km_path, "w") as out:
            for name in rows:
                feats = featurize(
                    reader.read(os.path.join(directory, name)).squeeze())
                ids = assign_clusters(feats, centroids) if len(feats) else []
                out.write(" ".join(str(int(i)) for i in ids) + "\n")
        logger.info("%s: %d utterances -> %s", tsv, len(rows), km_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
