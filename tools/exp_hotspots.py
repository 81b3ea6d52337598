"""Drill into the two hot components of the pretrain step (see
tools/exp_step_breakdown.py: transformer f+b 32.6 ms, conv f+b 17.3 ms of
the 62.7 ms step).

Variants (all scalar-reduced, grads wrt params):
  trans-nodrop  - 12L stack fwd+bwd with ALL dropout off (dropout cost)
  trans-attn    - 12L attention-only sublayers (residual+LN, no FFN)
  trans-ffn     - 12L FFN-only sublayers
  conv-L0       - layer 0 only (k=10, s=5, 1->512) via lax.conv
  conv-L0-mm    - layer 0 as reshape+matmul (phases of stride 5)
  groupnorm     - the block-0 GroupNorm at (8, 34999, 512)

Run: timeout 3500 python -u tools/exp_hotspots.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=30):
    out = fn(*args)
    assert np.asarray(out).size == 1
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - start) / n * 1e3


def gsum_of(fwd):
    def g(p, x):
        gr = jax.grad(fwd)(p, x)
        return sum(jnp.sum(l.astype(jnp.float32) ** 2)
                   for l in jax.tree_util.tree_leaves(gr))
    return g


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    B, T2, D = 8, 546, 768

    from audio8_tpu.nn.transformer import TransformerEncoderStack

    h = jnp.asarray(rng.normal(size=(B, T2, D)).astype(np.float32)).astype(jnp.bfloat16)

    def stack_time(label, **kw):
        kw.setdefault("d_ff", 3072)
        stack = TransformerEncoderStack(
            num_heads=12, d_model=D, num_layers=12,
            pre_norm=False, dtype=jnp.bfloat16, **kw)
        p = stack.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)},
                       h[:1], deterministic=False)["params"]
        det = kw.get("dropout_rate", 0.1) == 0.0

        def fwd(p, x):
            y = stack.apply({"params": p}, x, deterministic=det,
                            rngs=None if det else {"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(y.astype(jnp.float32) ** 2)

        t = timeit(jax.jit(gsum_of(fwd)), p, h)
        print(f"{label:24s} {t:7.2f} ms", flush=True)
        return t

    import os
    if os.environ.get("A8T_SKIP_DONE") != "1":
        stack_time("trans f+b (train)", dropout_rate=0.1, attention_dropout=0.1)
        stack_time("trans f+b no dropout", dropout_rate=0.0, attention_dropout=0.0)
        stack_time("trans f+b resid-drop only", dropout_rate=0.1,
                   attention_dropout=0.0)
    # attention-dominated variant isolates the FFN share
    stack_time("trans f+b d_ff=128", dropout_rate=0.1, attention_dropout=0.1,
               d_ff=128)

    # ---------------- conv layer 0 variants
    T = 175_000
    x = jnp.asarray(rng.normal(size=(B, T)).astype(np.float32))
    w0 = jnp.asarray((rng.normal(size=(10, 1, 512)) * 0.1).astype(np.float32)).astype(jnp.bfloat16)

    from audio8_tpu.nn.layers import _conv1d_nwc

    def l0_conv(w, x):
        y = _conv1d_nwc(x[..., None].astype(jnp.bfloat16), w, 5, "VALID")
        return jnp.sum(y.astype(jnp.float32) ** 2)

    t = timeit(jax.jit(gsum_of(l0_conv)), w0, x)
    print(f"conv-L0 lax f+b          {t:7.2f} ms", flush=True)

    def l0_mm(w, x):
        # phases of stride 5: frames r = (B, T/5, 5); window t = [r[t], r[t+1]]
        xb = x.astype(jnp.bfloat16)
        r = xb[:, : (T // 5) * 5].reshape(B, T // 5, 5)
        pair = jnp.concatenate([r[:, :-1], r[:, 1:]], axis=-1)  # (B, T/5-1, 10)
        y = pair @ w.reshape(10, 512)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    t = timeit(jax.jit(gsum_of(l0_mm)), w0, x)
    print(f"conv-L0 reshape-mm f+b   {t:7.2f} ms", flush=True)

    # ---------------- GroupNorm at block-0 shape
    from audio8_tpu.nn.layers import GroupNorm

    T1 = 34_999
    z = jnp.asarray(rng.normal(size=(B, T1, 512)).astype(np.float32)).astype(jnp.bfloat16)
    gn = GroupNorm(num_groups=512, dtype=jnp.bfloat16)
    gp = gn.init(jax.random.PRNGKey(0), z[:1])["params"]

    def gn_fwd(p, x):
        return jnp.sum(gn.apply({"params": p}, x).astype(jnp.float32) ** 2)

    t = timeit(jax.jit(gsum_of(gn_fwd)), gp, z)
    print(f"groupnorm f+b            {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
