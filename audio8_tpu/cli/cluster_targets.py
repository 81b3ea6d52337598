"""Generate HuBERT pretraining targets: MFCC k-means cluster ids.

Reads TSV manifests (the reference's format: dir header +
``file\\tnum_samples`` rows, /root/reference/audio8/data.py:168-196),
computes conv-grid-aligned MFCCs (data/mfcc.py), fits k-means on a frame
subsample of the FIRST manifest, and writes one ``.km`` file per
manifest (one line per utterance: space-separated cluster ids, one id
per encoder frame — the fairseq HuBERT label format) plus the centroids
as ``.npy`` for later assignment runs.

Usage:
  a8t-cluster-targets --root_dir /data --manifests train.tsv valid.tsv \\
      --num_clusters 100
  a8t-pretrain-hubert ... --train_dataset train.tsv  # picks up train.km
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
    args = p.parse_args(argv)

    reader = SoundfileAudioReader()
    rng = np.random.default_rng(args.seed)
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
            feats = mfcc(reader.read(os.path.join(directory, name)).squeeze())
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
                feats = mfcc(
                    reader.read(os.path.join(directory, name)).squeeze())
                ids = assign_clusters(feats, centroids) if len(feats) else []
                out.write(" ".join(str(int(i)) for i in ids) + "\n")
        logger.info("%s: %d utterances -> %s", tsv, len(rows), km_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
