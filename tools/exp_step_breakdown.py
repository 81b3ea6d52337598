"""Transfer-clean component breakdown of the wav2vec2-base pretrain step.

Round-1 component timings were polluted by fetching large outputs through
the axon relay (~10 s/GB); every timed function here reduces to a scalar
on device. Grads are taken wrt PARAMS (like training), not inputs.

Components at the bench shapes (B=8, T=175k samples, T'=546 frames, bf16):
  full    - the bench train step (sanity vs bench.py)
  conv    - ConvFeatureExtractor fwd / fwd+bwd(params)
  trans   - 12-layer TransformerEncoderStack fwd / fwd+bwd(params),
            train mode (dropout 0.1 / attn-dropout 0.1) like pretraining

Run: timeout 3500 python -u tools/exp_step_breakdown.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=30):
    out = fn(*args)
    assert np.asarray(out).size == 1, "timed fns must reduce to a scalar"
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - start) / n * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    B, T = 8, 175_000

    # ---------------- full train step (sanity; matches bench.py)
    from audio8_tpu.config import PretrainConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2Model
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_pretrain_steps

    cfg = PretrainConfig(d_ff=3072, dropout=0.1)
    model = Wav2Vec2Model(config=cfg, dtype=jnp.bfloat16)
    signal = jnp.asarray(rng.normal(size=(B, T)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    params = model.init(rngs, signal[:1, :16000], train=True)["params"]
    tx = create_optimizer(create_lrs(5e-4, 1000, warmup_steps=10), weight_decay=0.01)
    state = TrainState.create(params, tx)
    train_step, _ = make_pretrain_steps(model, tx, clip=1.0, n_negatives=100)
    key = jax.random.PRNGKey(7)

    state, metrics = train_step(state, signal, key)
    np.asarray(metrics["loss"])
    start = time.perf_counter()
    for i in range(30):
        state, metrics = train_step(state, signal, key)
    np.asarray(metrics["loss"])
    t_full = (time.perf_counter() - start) / 30 * 1e3
    print(f"full train step      {t_full:7.2f} ms", flush=True)

    # ---------------- conv feature extractor
    from audio8_tpu.models.wav2vec2 import ConvFeatureExtractor

    fx = ConvFeatureExtractor(conv_features=cfg.conv_features,
                              dtype=jnp.bfloat16)
    fx_params = fx.init(jax.random.PRNGKey(0), signal[:1, :16000])["params"]

    def fx_fwd(p, x):
        return jnp.sum(fx.apply({"params": p}, x).astype(jnp.float32) ** 2)

    f1 = jax.jit(fx_fwd)
    t_cf = timeit(f1, fx_params, signal)
    print(f"conv fwd             {t_cf:7.2f} ms", flush=True)

    def fx_gsum(p, x):
        g = jax.grad(fx_fwd)(p, x)
        return sum(jnp.sum(l.astype(jnp.float32) ** 2)
                   for l in jax.tree_util.tree_leaves(g))

    f2 = jax.jit(fx_gsum)
    t_cb = timeit(f2, fx_params, signal)
    print(f"conv fwd+bwd(params) {t_cb:7.2f} ms", flush=True)

    # ---------------- transformer stack (12L, 768), train mode
    from audio8_tpu.nn.transformer import TransformerEncoderStack

    T2 = 546
    stack = TransformerEncoderStack(
        num_heads=12, d_model=768, num_layers=12, d_ff=3072,
        dropout_rate=0.1, attention_dropout=0.1, pre_norm=False,
        dtype=jnp.bfloat16)
    h = jnp.asarray(rng.normal(size=(B, T2, 768)).astype(np.float32)).astype(jnp.bfloat16)
    st_params = stack.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           h[:1], deterministic=False)["params"]

    def st_fwd(p, x):
        y = stack.apply({"params": p}, x, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(y.astype(jnp.float32) ** 2)

    s1 = jax.jit(st_fwd)
    t_tf = timeit(s1, st_params, h)
    print(f"trans fwd (train)    {t_tf:7.2f} ms", flush=True)

    def st_gsum(p, x):
        g = jax.grad(st_fwd)(p, x)
        return sum(jnp.sum(l.astype(jnp.float32) ** 2)
                   for l in jax.tree_util.tree_leaves(g))

    s2 = jax.jit(st_gsum)
    t_tb = timeit(s2, st_params, h)
    print(f"trans fwd+bwd(params){t_tb:7.2f} ms", flush=True)

    print(f"\nresidue (full - conv_fb - trans_fb) = "
          f"{t_full - t_cb - t_tb:.2f} ms "
          f"(loss/quantizer/masking/update/overlap)", flush=True)


if __name__ == "__main__":
    main()
