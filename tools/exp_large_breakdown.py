"""Transfer-clean component breakdown of the wav2vec2-LARGE pretrain step.

Same method as tools/exp_step_breakdown.py (every timed function reduces
to a scalar on device; grads wrt PARAMS), at the LARGE dims the bench's
`--workload large` measures: d_model 1024, 24 layers, 16 heads, d_ff
4096, final_dim 768, on the round-4 headline geometry 16 x 82,000
samples (T'=256). Feeds the docs/PERF.md "wav2vec2-large pretraining"
section (VERDICT r4 #3).

Run: timeout 3500 python -u tools/exp_large_breakdown.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

D, L, HEADS, DFF, FINAL = 1024, 24, 16, 4096, 768
B, T = 16, 82_000


def timeit(fn, *args, n=20):
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

    from audio8_tpu.config import PretrainConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2Model
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_pretrain_steps

    cfg = PretrainConfig(d_model=D, num_heads=HEADS, num_layers=L,
                         d_ff=DFF, final_dim=FINAL, dropout=0.1)
    model = Wav2Vec2Model(config=cfg, dtype=jnp.bfloat16)
    signal = jnp.asarray(rng.normal(size=(B, T)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    params = model.init(rngs, signal[:1, :16000], train=True)["params"]
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params / 1e6:.1f}M", flush=True)
    tx = create_optimizer(create_lrs(5e-4, 1000, warmup_steps=10),
                          weight_decay=0.01)
    state = TrainState.create(params, tx)
    train_step, _ = make_pretrain_steps(model, tx, clip=1.0, n_negatives=100)
    key = jax.random.PRNGKey(7)

    state, metrics = train_step(state, signal, key)
    np.asarray(metrics["loss"])
    start = time.perf_counter()
    for _ in range(20):
        state, metrics = train_step(state, signal, key)
    np.asarray(metrics["loss"])
    t_full = (time.perf_counter() - start) / 20 * 1e3
    audio = B * T / 16_000
    print(f"full train step      {t_full:7.2f} ms "
          f"({audio / (t_full / 1e3):.1f} audio-sec/sec)", flush=True)

    # ---------------- conv feature extractor (same stack as base)
    from audio8_tpu.models.wav2vec2 import ConvFeatureExtractor

    fx = ConvFeatureExtractor(conv_features=cfg.conv_features,
                              dtype=jnp.bfloat16)
    fx_params = fx.init(jax.random.PRNGKey(0), signal[:1, :16000])["params"]

    def fx_fwd(p, x):
        return jnp.sum(fx.apply({"params": p}, x).astype(jnp.float32) ** 2)

    t_cf = timeit(jax.jit(fx_fwd), fx_params, signal)
    print(f"conv fwd             {t_cf:7.2f} ms", flush=True)

    def fx_gsum(p, x):
        g = jax.grad(fx_fwd)(p, x)
        return sum(jnp.sum(l.astype(jnp.float32) ** 2)
                   for l in jax.tree_util.tree_leaves(g))

    t_cb = timeit(jax.jit(fx_gsum), fx_params, signal)
    print(f"conv fwd+bwd(params) {t_cb:7.2f} ms", flush=True)

    # ---------------- transformer stack (24L, 1024), train mode
    from audio8_tpu.config import conv_output_length
    from audio8_tpu.nn.transformer import TransformerEncoderStack

    T2 = conv_output_length(T, cfg.conv_features)
    stack = TransformerEncoderStack(
        num_heads=HEADS, d_model=D, num_layers=L, d_ff=DFF,
        dropout_rate=0.1, attention_dropout=0.1, pre_norm=False,
        dtype=jnp.bfloat16)
    h = jnp.asarray(rng.normal(size=(B, T2, D)).astype(np.float32)) \
        .astype(jnp.bfloat16)
    st_params = stack.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           h[:1], deterministic=False)["params"]

    def st_fwd(p, x):
        y = stack.apply({"params": p}, x, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(y.astype(jnp.float32) ** 2)

    t_tf = timeit(jax.jit(st_fwd), st_params, h)
    print(f"trans fwd (train)    {t_tf:7.2f} ms", flush=True)

    def st_gsum(p, x):
        g = jax.grad(st_fwd)(p, x)
        return sum(jnp.sum(l.astype(jnp.float32) ** 2)
                   for l in jax.tree_util.tree_leaves(g))

    t_tb = timeit(jax.jit(st_gsum), st_params, h)
    print(f"trans fwd+bwd(params){t_tb:7.2f} ms", flush=True)

    print(f"\nresidue (full - conv_fb - trans_fb) = "
          f"{t_full - t_cb - t_tb:.2f} ms "
          f"(loss/quantizer/masking/update/overlap)", flush=True)


if __name__ == "__main__":
    main()
