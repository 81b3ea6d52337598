"""Measure the Pallas k3s2 conv kernel vs XLA's conv lowering on TPU.

Times the chained four k=3/s=2 512-ch wav2vec2 extractor layers (the conv
stack's FLOP carriers) end-to-end per implementation — one compile per
variant, which matters on this environment's 1-5 min remote compiles:

  1. XLA lax.conv chain           (fwd, fwd+bwd)
  2. Pallas conv1d_k3s2 chain     (fwd, fwd+bwd)
  3. dense-matmul FLOP equivalent (speed-of-light proxy)

Run: timeout 3500 python -u tools/exp_conv_kernel.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from audio8_tpu.nn.layers import _conv1d_nwc
from audio8_tpu.ops.pallas.conv_kernel import conv1d_k3s2

B = 8
T_IN = 34_999  # output of L0 at T=175k samples
C = 512
N_LAYERS = 4


def timeit(fn, *args, n=30):
    """fn MUST return a scalar: fetching large outputs through the axon
    relay costs ~10s/GB and would dominate the timing (the first version
    of this script measured a 2 ms matmul at 323 ms that way)."""
    out = fn(*args)
    assert np.asarray(out).size == 1, "timed fns must reduce to a scalar"
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - start) / n * 1e3


def chain(conv, x, ws):
    for w in ws:
        x = conv(x, w)
    return x


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T_IN, C)).astype(np.float32)).astype(jnp.bfloat16)
    ws = [jnp.asarray((rng.normal(size=(3, C, C)) * 0.03).astype(np.float32)).astype(jnp.bfloat16)
          for _ in range(N_LAYERS)]

    # total fwd GFLOP of the chain
    gflop, t = 0.0, T_IN
    for _ in range(N_LAYERS):
        t = (t - 3) // 2 + 1
        gflop += 2 * B * t * 3 * C * C / 1e9

    xla_c = lambda x, w: _conv1d_nwc(x, w, 2, "VALID")

    def loss(conv, x):
        return jnp.sum(chain(conv, x, ws).astype(jnp.float32) ** 2)

    f_xla = jax.jit(lambda x: loss(xla_c, x))
    f_pal = jax.jit(lambda x: loss(conv1d_k3s2, x))

    r = float(f_xla(x))
    p = float(f_pal(x))
    print(f"chain fwd loss rel-err {abs(r-p)/abs(r):.2e}", flush=True)

    t_xf = timeit(f_xla, x)
    print(f"fwd   xla    {t_xf:7.2f} ms  ({gflop/t_xf:5.0f} GF/ms)", flush=True)
    t_pf = timeit(f_pal, x)
    print(f"fwd   pallas {t_pf:7.2f} ms  ({gflop/t_pf:5.0f} GF/ms)", flush=True)

    # grad summarised to a scalar on-device (see timeit docstring)
    def gsum(conv, x):
        g = jax.grad(lambda x: loss(conv, x))(x)
        return jnp.sum(g.astype(jnp.float32) ** 2)

    g_xla = jax.jit(lambda x: gsum(xla_c, x))
    g_pal = jax.jit(lambda x: gsum(conv1d_k3s2, x))
    rg, pg = float(g_xla(x)), float(g_pal(x))
    print(f"chain |dx|^2 rel-err {abs(rg-pg)/abs(rg):.2e}", flush=True)

    t_xb = timeit(g_xla, x)
    print(f"f+bwd xla    {t_xb:7.2f} ms  ({3*gflop/t_xb:5.0f} GF/ms eff)", flush=True)
    t_pb = timeit(g_pal, x)
    print(f"f+bwd pallas {t_pb:7.2f} ms  ({3*gflop/t_pb:5.0f} GF/ms eff)", flush=True)

    # dense matmul with the same total FLOPs as the fwd chain
    rows = int(gflop * 1e9 / (2 * 3 * C * C))
    a = jnp.asarray(rng.normal(size=(rows, 3 * C)).astype(np.float32)).astype(jnp.bfloat16)
    m = jnp.asarray(rng.normal(size=(3 * C, C)).astype(np.float32)).astype(jnp.bfloat16)
    f_mm = jax.jit(lambda a, m: jnp.sum((a @ m).astype(jnp.float32) ** 2))
    t_mm = timeit(f_mm, a, m)
    print(f"fwd-FLOPs mm {t_mm:7.2f} ms  ({gflop/t_mm:5.0f} GF/ms)  [SOL proxy]", flush=True)


if __name__ == "__main__":
    main()
