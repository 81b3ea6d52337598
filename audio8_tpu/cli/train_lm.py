"""Causal text-LM training (for n-best rescoring of CTC output).

A workload beyond the reference, whose only LM story is ARPA fusion
inside the beam decoder (/root/reference/audio8/ctc.py:22-30): train a
small decoder-only transformer (models/text.CausalTextLM) on the same
``.ltr``/``.wrd`` transcript files the CTC recipes use, then rescore
beam n-best lists with it (``a8t-test --lm_rescore``).

TPU-shape notes: lines are packed into fixed ``(B, block_len + 1)``
token blocks (GPT-style, EOS-separated) — one compiled program, no
padding waste; Shaw relative attention means eval scores any hypothesis
length despite the fixed training block.

    a8t-train-lm --text train.ltr --valid_text valid.ltr \
        --dict_file dict.ltr.txt --basedir runs/lm
"""
from __future__ import annotations

import json
import logging
import os
import time
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from audio8_tpu.cli.common import setup
from audio8_tpu.config import TextLMConfig
from audio8_tpu.models.text import CausalTextLM, TextVectorizer, read_vocab_list
from audio8_tpu.parallel.sharding import make_mesh, put_batch, shard_state
from audio8_tpu.train.checkpoint import save_checkpoint
from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
from audio8_tpu.train.preempt import PreemptionGuard
from audio8_tpu.train.steps import make_lm_steps
from audio8_tpu.utils import Average, Offsets, str2bool

logger = logging.getLogger("audio8_tpu.train_lm")


def pack_token_stream(files, vec, block_len: int, seed: int = 0,
                      shuffle: bool = True) -> np.ndarray:
    """Whitespace-token lines -> ``(N, block_len + 1)`` packed id blocks.

    Each line ends with EOS; the stream starts with GO (the scoring
    convention, CausalTextLM.sequence_logp) and chops into overlapping-
    by-one blocks so every token is a target exactly once. The final
    partial block pads with PAD (masked in the loss)."""
    lines: list = []
    for path in files:
        with open(path) as f:
            lines.extend(l.split() for l in f if l.strip())
    if shuffle:
        np.random.RandomState(seed).shuffle(lines)
    ids = [Offsets.GO]
    for toks in lines:
        ids.extend(int(i) for i in vec.run(toks))
        ids.append(Offsets.EOS)
    n_blocks = max((len(ids) - 1 + block_len - 1) // block_len, 1)
    out = np.full((n_blocks, block_len + 1), Offsets.PAD, np.int32)
    for b in range(n_blocks):
        chunk = ids[b * block_len: b * block_len + block_len + 1]
        out[b, :len(chunk)] = chunk
    return out


def parse_args(argv=None):
    p = ArgumentParser(description=__doc__)
    p.add_argument("--basedir", type=str)
    p.add_argument("--text", nargs="+", required=True,
                   help=".ltr/.wrd/.bpe transcript files (whitespace tokens)")
    p.add_argument("--valid_text", nargs="+", default=[])
    p.add_argument("--dict_file", required=True)
    p.add_argument("--d_model", type=int, default=512)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--num_layers", type=int, default=6)
    p.add_argument("--d_ff", type=int, default=2048)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--rpr_k", type=int, default=8)
    p.add_argument("--block_len", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=3.0e-4)
    p.add_argument("--lr_scheduler", default="cosine")
    p.add_argument("--warmup_steps", type=int, default=1000)
    p.add_argument("--clip", type=float, default=1.0)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--train_steps", type=int, default=50_000)
    p.add_argument("--steps_per_checkpoint", type=int, default=2000)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--distributed", type=str2bool, default=False)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def train(argv=None):
    args = parse_args(argv)
    if args.basedir is None:
        args.basedir = f"textlm-{os.getpid()}"
    os.makedirs(args.basedir, exist_ok=True)
    rank, world = setup(args.distributed)
    preempt = PreemptionGuard()
    mesh = make_mesh(data=-1, model=1)

    vocab_list = read_vocab_list(args.dict_file)
    vocab = {v: i for i, v in enumerate(vocab_list)}
    vec = TextVectorizer(vocab)
    cfg = TextLMConfig(vocab_size=len(vocab_list), d_model=args.d_model,
                       num_heads=args.num_heads, num_layers=args.num_layers,
                       d_ff=args.d_ff, dropout=args.dropout,
                       rpr_k=args.rpr_k, block_len=args.block_len)
    # sidecar config so the rescorer self-configures from the basedir
    with open(os.path.join(args.basedir, "lm_config.json"), "w") as f:
        json.dump(dict(cfg.__dict__, dict_file=os.path.abspath(args.dict_file)), f)

    blocks = pack_token_stream(args.text, vec, args.block_len, args.seed)
    valid_blocks = (pack_token_stream(args.valid_text, vec, args.block_len,
                                      shuffle=False)
                    if args.valid_text else None)
    logger.info("packed %d train blocks of %d tokens (%s)", len(blocks),
                args.block_len, [os.path.basename(t) for t in args.text])

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = CausalTextLM(config=cfg, dtype=dtype)
    tx = create_optimizer(
        create_lrs(args.lr, args.train_steps, args.lr_scheduler,
                   warmup_steps=args.warmup_steps),
        weight_decay=args.weight_decay)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, args.block_len), jnp.int32))["params"]
    state = TrainState.create(init, tx)
    from audio8_tpu.parallel.sharding import DP_ONLY_RULES
    state = shard_state(state, mesh, DP_ONLY_RULES)
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(state.params))
    logger.info("LM has %s parameters", f"{n_params:,}")

    train_step, eval_fn = make_lm_steps(model, tx, clip=args.clip)
    model_base = os.path.join(args.basedir, "checkpoint")
    avg_loss = Average("average_train_loss")
    rng = jax.random.PRNGKey(args.seed)
    perm = np.random.RandomState(args.seed + 1)

    # batch sampler: random blocks per step (with replacement is fine for
    # a packed stream; every token appears once per epoch-equivalent)
    b = max(args.batch_size // max(world, 1), 1)
    gstep = int(state.step)
    report_on = max(args.steps_per_checkpoint // 10, 10)
    start = time.time()
    while gstep < args.train_steps:
        rows = perm.randint(0, len(blocks), size=b)
        batch = put_batch({"ids": blocks[rows]}, mesh)
        rng, sub = jax.random.split(rng)
        state, metrics = train_step(state, batch, sub)
        gstep += 1
        if gstep % 8 == 0:
            avg_loss.update(float(metrics["loss"]), n=8)
        if gstep % report_on == 0 and avg_loss.avg:
            sps = gstep / (time.time() - start)
            logger.info("%s (ppl %.2f), steps/min %.1f", avg_loss,
                        float(np.exp(min(avg_loss.avg, 20.0))), sps * 60)
        if gstep % args.steps_per_checkpoint == 0 or gstep == args.train_steps:
            if valid_blocks is not None:
                nll, ntok = 0.0, 0.0
                for i0 in range(0, len(valid_blocks), b):
                    vb = valid_blocks[i0:i0 + b]
                    if len(vb) < b:  # pad to the compiled batch shape
                        vb = np.concatenate(
                            [vb, np.full((b - len(vb), vb.shape[1]),
                                         Offsets.PAD, np.int32)])
                    loss, n = eval_fn(state.params,
                                      put_batch({"ids": vb}, mesh))
                    nll += float(loss) * float(n)
                    ntok += float(n)
                if rank == 0:
                    logger.info({"valid_nll": nll / max(ntok, 1),
                                 "valid_ppl": float(np.exp(min(nll / max(ntok, 1), 20.0))),
                                 "step": gstep})
            save_checkpoint(state, model_base, gstep, tick_type="step")
        if preempt.should_save(gstep):
            save_checkpoint(state, model_base, gstep, tick_type="step")
            if rank == 0:
                logger.warning("preempted: saved step %d, exiting", gstep)
            break
    return state


def main():
    train()


if __name__ == "__main__":
    main()
