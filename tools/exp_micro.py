"""Micro-experiments for the remaining step hotspots.

  qkv      - 3 separate (BT, 768)@(768, 768) matmuls vs one fused
             (768, 2304): is Megatron-style QKV fusion worth the param
             plumbing?
  gn-vjp   - GroupNorm with autodiff bwd vs an algebraic custom-VJP
             formulation (fewer HBM passes) at the block-0 shape.

Run: timeout 3500 python -u tools/exp_micro.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=50):
    out = fn(*args)
    assert np.asarray(out).size == 1
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - start) / n * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # ---------------- qkv fusion (12 layers' worth in one program)
    BT, D = 8 * 546, 768
    x = jnp.asarray(rng.normal(size=(BT, D)).astype(np.float32)).astype(jnp.bfloat16)
    w3 = [jnp.asarray((rng.normal(size=(D, D)) * 0.03).astype(np.float32)).astype(jnp.bfloat16)
          for _ in range(3)]
    wf = jnp.concatenate(w3, axis=1)  # (D, 3D)

    def split_mm(x, w3):
        s = jnp.float32(0)
        for _ in range(12):
            q, k, v = (x @ w3[0], x @ w3[1], x @ w3[2])
            s = s + jnp.sum(q.astype(jnp.float32)) + jnp.sum(k.astype(jnp.float32)) + jnp.sum(v.astype(jnp.float32))
        return s

    def fused_mm(x, wf):
        s = jnp.float32(0)
        for _ in range(12):
            qkv = x @ wf
            s = s + jnp.sum(qkv.astype(jnp.float32))
        return s

    t_s = timeit(jax.jit(split_mm), x, w3)
    t_f = timeit(jax.jit(fused_mm), x, wf)
    print(f"qkv 12x: split {t_s:6.2f} ms | fused {t_f:6.2f} ms", flush=True)

    # ---------------- GroupNorm custom-VJP vs autodiff
    B, T1, C = 8, 34_999, 512
    z = jnp.asarray(rng.normal(size=(B, T1, C)).astype(np.float32)).astype(jnp.bfloat16)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)

    def gn_ref(z, scale, bias):
        x32 = z.astype(jnp.float32)
        mean = jnp.mean(x32, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        return (y * scale + bias).astype(z.dtype)

    @jax.custom_vjp
    def gn_fast(z, scale, bias):
        return _gn_fwd(z, scale, bias)[0]

    def _gn_fwd(z, scale, bias):
        x32 = z.astype(jnp.float32)
        mean = jnp.mean(x32, axis=1, keepdims=True)
        ex2 = jnp.mean(jnp.square(x32), axis=1, keepdims=True)
        var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
        rstd = jax.lax.rsqrt(var + 1e-5)
        y = (x32 - mean) * rstd
        out = (y * scale + bias).astype(z.dtype)
        return out, (z, mean, rstd, scale)

    def _gn_bwd(res, dy):
        z, mean, rstd, scale = res
        dy32 = dy.astype(jnp.float32)
        xhat = (z.astype(jnp.float32) - mean) * rstd
        dscale = jnp.sum(dy32 * xhat, axis=(0, 1))
        dbias = jnp.sum(dy32, axis=(0, 1))
        g = dy32 * scale
        n = z.shape[1]
        dx = rstd * (g - jnp.mean(g, axis=1, keepdims=True)
                     - xhat * jnp.mean(g * xhat, axis=1, keepdims=True))
        return dx.astype(z.dtype), dscale, dbias

    gn_fast.defvjp(_gn_fwd, _gn_bwd)

    def loss_of(gn):
        def f(z, scale, bias):
            return jnp.sum(gn(z, scale, bias).astype(jnp.float32) ** 2)
        def g(z, scale, bias):
            gr = jax.grad(f, argnums=(0, 1, 2))(z, scale, bias)
            return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in gr)
        return g

    # parity check first
    r = jax.jit(jax.grad(lambda z: jnp.sum(gn_ref(z, scale, bias).astype(jnp.float32) ** 2)))(z)
    f = jax.jit(jax.grad(lambda z: jnp.sum(gn_fast(z, scale, bias).astype(jnp.float32) ** 2)))(z)
    err = float(jnp.max(jnp.abs(r.astype(jnp.float32) - f.astype(jnp.float32))))
    print(f"gn dx err {err:.3e}", flush=True)

    t_r = timeit(jax.jit(loss_of(gn_ref)), z, scale, bias)
    t_f2 = timeit(jax.jit(loss_of(gn_fast)), z, scale, bias)
    print(f"groupnorm f+b: autodiff {t_r:6.2f} ms | custom-vjp {t_f2:6.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
