"""Transfer-clean component breakdown of the CTC fine-tune step
(train.py workload; bench.py --workload ctc shapes).

Same measurement discipline as exp_step_breakdown.py: every timed
function reduces to a scalar on device (the axon relay moves ~10 s/GB,
so fetching activations would time the transfer, not the compute).

Components at the bench shapes (B=16, t=48k samples, T'=149 frames,
U=64 letter targets, bf16):
  full        - the fused grad+update CTC train step (sanity vs bench.py)
  full_frozen - same with the encoder frozen (stop_gradient path)
  conv        - ConvFeatureExtractor fwd / fwd+bwd(params)
  trans       - 12-layer stack fwd+bwd at T'=149
  ctc         - CTC loss (Pallas kernel) fwd+grad wrt (B,T',V) logits

Run: timeout 3500 python -u tools/exp_ctc_breakdown.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=50):
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
    B, t, U = 16, 48_000, 64

    from audio8_tpu.config import AcousticConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_ctc_steps
    from audio8_tpu.utils import Offsets

    Offsets.remap_fairseq_ctc()
    cfg = AcousticConfig(num_labels=32, d_ff=3072, dropout=0.1,
                         timestep_masking=0.5, channel_masking=0.1)
    model = Wav2Vec2AcousticModel(config=cfg, dtype=jnp.bfloat16)
    batch = {
        "signal": jnp.asarray(rng.normal(size=(B, t)).astype(np.float32)),
        "signal_lengths": jnp.full((B,), t, jnp.int32),
        "token_ids": jnp.asarray(rng.integers(4, 32, size=(B, U)), jnp.int32),
        "token_lengths": jnp.full((B,), U, jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["signal"][:1],
                        batch["signal_lengths"][:1])["params"]
    # host copy: the fused step donates its state buffers, so each freeze
    # variant needs a freshly materialized TrainState
    params_np = jax.tree_util.tree_map(np.asarray, params)
    tx = create_optimizer(create_lrs(1e-4, 1000, warmup_steps=10))
    grad_fn, _, _ = make_ctc_steps(model, tx, clip=25.0)
    step = grad_fn.train_step
    key = jax.random.PRNGKey(3)

    for freeze, name in ((False, "full train step     "),
                         (True,  "full (frozen fx)    ")):
        st = TrainState.create(
            jax.tree_util.tree_map(jnp.asarray, params_np), tx)
        st, loss, _, _ = step(st, batch, key, freeze=freeze)
        np.asarray(loss)
        start = time.perf_counter()
        for _ in range(50):
            st, loss, _, _ = step(st, batch, key, freeze=freeze)
        np.asarray(loss)
        ms = (time.perf_counter() - start) / 50 * 1e3
        print(f"{name} {ms:7.2f} ms "
              f"({B * t / 16000 / (ms / 1e3):.0f} audio-sec/sec)", flush=True)

    # ---------------- conv feature extractor at the CTC shape
    from audio8_tpu.models.wav2vec2 import ConvFeatureExtractor

    fx = ConvFeatureExtractor(conv_features=cfg.conv_features,
                              dtype=jnp.bfloat16)
    fx_params = fx.init(jax.random.PRNGKey(0),
                        batch["signal"][:1, :16000])["params"]

    def fx_fwd(p, x):
        return jnp.sum(fx.apply({"params": p}, x).astype(jnp.float32) ** 2)

    print(f"conv fwd             {timeit(jax.jit(fx_fwd), fx_params, batch['signal']):7.2f} ms",
          flush=True)

    def fx_gsum(p, x):
        g = jax.grad(fx_fwd)(p, x)
        return sum(jnp.sum(l.astype(jnp.float32) ** 2)
                   for l in jax.tree_util.tree_leaves(g))

    print(f"conv fwd+bwd(params) {timeit(jax.jit(fx_gsum), fx_params, batch['signal']):7.2f} ms",
          flush=True)

    # ---------------- transformer stack at T'=149
    from audio8_tpu.nn.transformer import TransformerEncoderStack

    T2 = 149
    stack = TransformerEncoderStack(
        num_heads=12, d_model=768, num_layers=12, d_ff=3072,
        dropout_rate=0.1, attention_dropout=0.1, pre_norm=False,
        dtype=jnp.bfloat16)
    h = jnp.asarray(rng.normal(size=(B, T2, 768)), jnp.bfloat16)
    st_params = stack.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           h[:1], deterministic=False)["params"]

    def st_fwd(p, x):
        y = stack.apply({"params": p}, x, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def st_gsum(p, x):
        g = jax.grad(st_fwd)(p, x)
        return sum(jnp.sum(l.astype(jnp.float32) ** 2)
                   for l in jax.tree_util.tree_leaves(g))

    print(f"trans fwd (train)    {timeit(jax.jit(st_fwd), st_params, h):7.2f} ms", flush=True)
    print(f"trans fwd+bwd(params){timeit(jax.jit(st_gsum), st_params, h):7.2f} ms", flush=True)

    # ---------------- CTC loss fwd+grad wrt log-probs
    from audio8_tpu.ops.ctc import ctc_loss

    V = 32
    logits = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(B, T2, V)), jnp.float32))
    ll = jnp.full((B,), T2, jnp.int32)

    def ctc_fwd(lg):
        return ctc_loss(lg, ll, batch["token_ids"], batch["token_lengths"],
                        blank=Offsets.GO, reduction="sum")

    def ctc_g(lg):
        v, g = jax.value_and_grad(ctc_fwd)(lg)
        return v + jnp.sum(g.astype(jnp.float32) ** 2)

    print(f"ctc loss fwd         {timeit(jax.jit(ctc_fwd), logits):7.2f} ms", flush=True)
    print(f"ctc loss fwd+grad    {timeit(jax.jit(ctc_g), logits):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
