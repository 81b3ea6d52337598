"""Average the params of several checkpoints into one.

Standard ASR practice (fairseq ships ``average_checkpoints.py``; the
reference has no equivalent — its best-metric checkpoint,
/root/reference/audio8/train.py:395-398, is the closest notion): the
last-k step checkpoints of a fine-tune run are averaged elementwise,
which typically buys a small WER improvement for free at eval time.

Works on a8t Orbax checkpoint dirs (TrainState or bare params). The
output checkpoint stores *params only* — optimizer state is not
meaningful for an averaged point — under the usual
``checkpoint-avg-{step}`` naming, loadable by every eval/serve CLI via
``resolve_restart``.

Usage:
    a8t-average-checkpoints --basedir out/ --last 5 --output out/avg
    a8t-average-checkpoints --checkpoints out/checkpoint-step-100 \
        out/checkpoint-step-200 --output out/avg
"""
from __future__ import annotations

import argparse
import logging
import os
import re

import jax
import numpy as np

logger = logging.getLogger("audio8_tpu")


def _params_of(tree):
    """Params subtree of a restored checkpoint (TrainState dict or bare)."""
    if isinstance(tree, dict) and "params" in tree:
        return tree["params"], tree.get("step")
    return tree, None


def list_step_checkpoints(basedir: str, base: str = "checkpoint"):
    """All ``{base}-step-N`` dirs under basedir, sorted by step."""
    pat = re.compile(re.escape(base) + r"-step-(\d+)$")
    found = []
    for name in os.listdir(basedir):
        m = pat.match(name)
        if m:
            found.append((int(m.group(1)), os.path.join(basedir, name)))
    return [p for _, p in sorted(found)], [s for s, _ in sorted(found)]


def average_checkpoints(paths):
    """Elementwise mean of the params of ``paths`` (f32 accumulation;
    integer/bool leaves are taken from the first checkpoint verbatim)."""
    from audio8_tpu.train.checkpoint import load_checkpoint

    if not paths:
        raise ValueError("no checkpoints to average")
    acc, step = _params_of(load_checkpoint(paths[0]))
    acc = jax.tree_util.tree_map(np.asarray, acc)
    sums = jax.tree_util.tree_map(
        lambda x: x.astype(np.float64) if np.issubdtype(x.dtype, np.floating)
        else x, acc)
    for p in paths[1:]:
        nxt, nxt_step = _params_of(load_checkpoint(p))
        step = max(step or 0, nxt_step or 0)
        sums = jax.tree_util.tree_map(
            lambda s, x: s + np.asarray(x, np.float64)
            if np.issubdtype(s.dtype, np.floating) else s,
            sums, nxt)
    n = float(len(paths))
    return jax.tree_util.tree_map(
        lambda s, x: (s / n).astype(x.dtype)
        if np.issubdtype(s.dtype, np.floating) else s,
        sums, acc), step


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--basedir", help="training output dir; averages the "
                                      "newest --last step checkpoints")
    ap.add_argument("--last", type=int, default=5)
    ap.add_argument("--checkpoints", nargs="+",
                    help="explicit checkpoint dirs (overrides --basedir)")
    ap.add_argument("--output", required=True,
                    help="output path prefix; writes {output}-avg-{step}")
    args = ap.parse_args(argv)

    if args.checkpoints:
        paths = args.checkpoints
    elif args.basedir:
        paths, _ = list_step_checkpoints(args.basedir)
        if len(paths) < 2:
            raise SystemExit(f"need >=2 step checkpoints in {args.basedir}, "
                             f"found {len(paths)}")
        paths = paths[-args.last:]
    else:
        raise SystemExit("pass --basedir or --checkpoints")

    logger.info("averaging %d checkpoints: %s", len(paths),
                [os.path.basename(p) for p in paths])
    params, step = average_checkpoints(paths)

    from audio8_tpu.train.checkpoint import save_checkpoint

    out = save_checkpoint({"params": params, "step": np.asarray(step or 0)},
                          args.output, step or 0, tick_type="avg")
    logger.info("wrote %s", out)
    return out


if __name__ == "__main__":
    main()
