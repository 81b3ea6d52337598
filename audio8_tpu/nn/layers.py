"""Core layer primitives for the TPU-native speech stack.

This is a from-scratch flax.linen layer library covering the slice of
`eight_mile` the reference uses (`Dense`, `pytorch_conv1d`, `Conv1DSame`,
GroupNorm/LayerNorm; see /root/reference/audio8/wav2vec2.py:9-21).
Conventions are JAX-native:

- activations are channel-last ``(B, T, C)`` everywhere (TPU lane dim = C),
  never the torch ``(B, C, T)`` layout;
- conv kernels are ``(K, C_in, C_out)`` (lax ``'WIO'``), dense kernels are
  ``(C_in, C_out)`` — the fairseq checkpoint converter transposes;
- every module takes a ``dtype`` (compute dtype, bfloat16 for speed runs) and
  keeps params in ``param_dtype`` (float32 master copy).
"""
from __future__ import annotations

import functools
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _conv1d_nwc(x, kernel, stride, padding, groups=1):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding=padding,
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups)


def _conv1d_cin1_matmul(x, kernel, stride):
    """C_in==1, k%stride==0 VALID conv as reshape+matmul.

    XLA's conv lowering underuses the MXU on a 1-wide input channel (the
    wav2vec2 waveform layer, k=10/s=5: 2.4 vs 1.8 ms f+b at the bench
    shape, tools/exp_hotspots.py). Reshape the signal into stride-width
    frames; each output window is k/stride consecutive frames, so the conv
    is one (B, T', k) @ (k, C_out) matmul. Exact same sums as the conv."""
    b, t, _ = x.shape
    k, _, c_out = kernel.shape
    p = k // stride
    rows = (t - k) // stride + 1
    r = x[:, : (t // stride) * stride, 0].reshape(b, t // stride, stride)
    win = jnp.concatenate([r[:, i: i + rows] for i in range(p)], axis=-1)
    return win @ kernel.reshape(k, c_out)


def _conv1d_nonoverlap_matmul(x, kernel):
    """kernel_size == stride VALID conv as exact reshape+matmul.

    Non-overlapping windows mean the conv IS ``x.reshape(B, T', K*C_in) @
    W.reshape(K*C_in, C_out)`` — and unlike the k3s2 phase decomposition
    (rejected, docs/PERF.md ablations) the backward is pure matmuls too:
    no overlap-add dgrad. Measured on the two k=2/s=2 wav2vec2 extractor
    layers (tools/exp_conv_k2s2.py, bench shape): f+b 1.86 vs 2.66 ms for
    XLA's conv lowering, parity exact to 0 ulp."""
    b, t, c_in = x.shape
    k, _, c_out = kernel.shape
    rows = t // k
    return x[:, : rows * k].reshape(b, rows, k * c_in) @ kernel.reshape(
        k * c_in, c_out)


def _grouped_conv1d_split(x, kernel, stride, padding, groups):
    """Grouped conv as an unrolled loop of dense (G=1) convs — numerically
    identical to ``feature_group_count=groups`` but avoids XLA's grouped-conv
    weight-gradient partitioning (see grouped_conv1d)."""
    ci = x.shape[-1] // groups
    co = kernel.shape[-1] // groups
    outs = [
        _conv1d_nwc(x[..., g * ci:(g + 1) * ci],
                    kernel[:, :, g * co:(g + 1) * co], stride, padding)
        for g in range(groups)
    ]
    return jnp.concatenate(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def grouped_conv1d(x, kernel, stride, padding, groups):
    """Grouped 1-D conv with a partitioner-safe gradient.

    XLA's SPMD partitioner (jax/jaxlib 0.9.0) miscomputes the weight
    gradient of a ``feature_group_count > 1`` convolution when the inputs
    are batch-sharded over one axis of a multi-axis mesh and the kernel is
    replicated: the per-shard partial wgrads are summed over the *unused*
    mesh axis too, scaling dW by exactly that axis's size (2x on a
    ('data', 'model')=(4, 2) mesh; minimal repro in
    tests/test_grouped_conv_mesh.py). The forward pass and the data
    gradient are unaffected.

    This wrapper keeps the fast fused grouped conv for the forward pass and
    computes the backward pass through an unrolled per-group formulation
    whose gradients XLA partitions correctly.
    """
    return _conv1d_nwc(x, kernel, stride, padding, groups)


def _grouped_conv1d_fwd(x, kernel, stride, padding, groups):
    return grouped_conv1d(x, kernel, stride, padding, groups), (x, kernel)


def _grouped_conv1d_bwd(stride, padding, groups, res, dy):
    x, kernel = res
    _, vjp = jax.vjp(
        lambda xx, kk: _grouped_conv1d_split(xx, kk, stride, padding, groups),
        x, kernel)
    return vjp(dy)


grouped_conv1d.defvjp(_grouped_conv1d_fwd, _grouped_conv1d_bwd)

# torch.nn.GELU defaults to the exact erf form; jax.nn.gelu defaults to the
# tanh approximation, so pin the exact form for numerical parity.
def gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


class PassThru(nn.Module):
    """Identity layer (eight_mile PassThru parity; used where the reference
    conditionally skips a projection, wav2vec2.py:815)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x


def int8_dot(x: jnp.ndarray, kernel_q: jnp.ndarray,
             kernel_scale: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """``x @ dequant(kernel)`` on the int8 MXU path.

    Dynamic per-token activation quantization (symmetric absmax over the
    contraction dim) against a per-output-channel weight scale: the MXU
    runs the int8 x int8 -> int32 matmul at twice bf16 throughput on v5e,
    and the int8 weights halve the HBM weight traffic vs bf16. Inference
    only (no custom VJP — the quantized path is never differentiated).
    """
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    x_scale = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, kernel_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * x_scale.astype(jnp.float32)
            * kernel_scale.astype(jnp.float32)).astype(out_dtype)


class Dense(nn.Module):
    """Linear layer; replaces eight_mile ``Dense``/``pytorch_linear``.

    Quant-aware at apply time: when the bound ``kernel`` variable is int8
    (produced by ``ops.quant.quantize_dense_tree``), the matmul runs on
    the int8 MXU path with the stored per-channel ``kernel_scale``; the
    module code and the param tree *structure* stay identical, so the
    same model definition serves both the f32/bf16 training path and the
    quantized serving path.
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features), self.param_dtype
        )
        if kernel.dtype == jnp.int8:
            scale = self.param(
                "kernel_scale", nn.initializers.ones_init(),
                (self.features,), jnp.float32)
            y = int8_dot(x.astype(self.dtype), kernel, scale, self.dtype)
        else:
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


def _kaiming_conv_init(key, shape, dtype):
    """He-normal on fan_in = K * C_in, matching the reference's kaiming conv
    init (/root/reference/audio8/wav2vec2.py:419)."""
    k, c_in, _ = shape
    std = math.sqrt(2.0 / (k * c_in))
    return jax.random.normal(key, shape, dtype) * std


class Conv1D(nn.Module):
    """Strided 1-D convolution over ``(B, T, C)``.

    Equivalent of the reference's ``pytorch_conv1d`` blocks
    (/root/reference/audio8/wav2vec2.py:399-456) but channel-last so the
    feature dim rides the TPU lane dimension and XLA lowers to MXU matmuls.
    """

    features: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = False
    groups: int = 1
    padding: Any = "VALID"  # int pair, 'VALID', or 'SAME'
    # Opt-in Pallas phase-decomposition kernel for k=3/s=2 layers. Measured
    # SLOWER than XLA's conv lowering (docs/PERF.md ablations: 8.0 vs 3.4 ms
    # chain fwd), kept as a tested ablation like the fused AdamW kernel.
    use_pallas: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Any = _kaiming_conv_init

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (self.kernel_size, c_in // self.groups, self.features),
            self.param_dtype,
        )
        if isinstance(self.padding, str):
            padding = self.padding
        else:
            padding = (tuple(self.padding),)
        use_pallas = False
        if self.use_pallas:
            from audio8_tpu.ops.pallas.conv_kernel import supported
            use_pallas = supported(x.shape, self.kernel_size, self.stride,
                                   self.padding, self.groups, self.dtype)
        if self.groups > 1:
            y = grouped_conv1d(x.astype(self.dtype), kernel.astype(self.dtype),
                               self.stride, padding, self.groups)
        elif use_pallas:
            from audio8_tpu.ops.pallas.conv_kernel import conv1d_k3s2
            y = conv1d_k3s2(x.astype(self.dtype), kernel.astype(self.dtype))
        elif (c_in == 1 and padding == "VALID" and self.stride > 1
              and self.kernel_size % self.stride == 0
              and x.shape[1] >= self.kernel_size):
            y = _conv1d_cin1_matmul(x.astype(self.dtype),
                                    kernel.astype(self.dtype), self.stride)
        elif (self.kernel_size == self.stride and padding == "VALID"
              and x.shape[1] >= self.kernel_size):
            y = _conv1d_nonoverlap_matmul(x.astype(self.dtype),
                                          kernel.astype(self.dtype))
        else:
            y = _conv1d_nwc(x.astype(self.dtype), kernel.astype(self.dtype),
                            self.stride, padding)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


class StackedPositionalConv(nn.Module):
    """data2vec-audio positional embedding: ``depth`` stacked blocks of
    [grouped conv (odd kernel, SAME padding, bias), affine-less LayerNorm,
    GELU] — no weight normalization (HF
    ``Data2VecAudioPositionalConvEmbedding``; fairseq data2vec names the
    convs ``encoder.pos_conv.{i}.0``). Complements :class:`PositionalConv`
    (the single weight-normed k=128 wav2vec2 layout).

    Params: ``layer_{i}`` -> ``kernel (K, C/groups, C)``, ``bias (C,)``.
    """

    features: int
    depth: int = 5
    kernel_size: int = 19
    groups: int = 16
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.kernel_size // 2
        for i in range(self.depth):
            x = Conv1D(features=self.features, kernel_size=self.kernel_size,
                       stride=1, padding=(pad, pad), groups=self.groups,
                       use_bias=True, name=f"layer_{i}",
                       dtype=self.dtype, param_dtype=self.param_dtype)(x)
            if self.kernel_size % 2 == 0:  # fairseq SamePad semantics
                x = x[:, :-1, :]
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
            x = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5)).astype(self.dtype)
            x = gelu(x)
        return x


class LayerNorm(nn.Module):
    """LayerNorm with torch epsilon (1e-5) and fp32 statistics."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (features,), self.param_dtype)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(self.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _group_norm_affine(x, scale, bias, num_groups, eps):
    """GroupNorm with an algebraic backward pass.

    XLA's autodiff of the two-pass mean/var formulation walks the (B, T, C)
    activation several extra times; the closed-form LayerNorm-style
    gradient (dx = rstd * (g - E[g] - xhat * E[g xhat])) measures
    2.52 -> 1.80 ms f+b at the wav2vec2 block-0 shape (tools/exp_micro.py
    — the win is the backward; the forward keeps the numerically stable
    two-pass variance)."""
    return _group_norm_fwd(x, scale, bias, num_groups, eps)[0]


def _group_norm_fwd(x, scale, bias, num_groups, eps):
    b, t, c = x.shape
    g = num_groups
    x32 = x.astype(jnp.float32).reshape(b, t, g, c // g)
    mean = jnp.mean(x32, axis=(1, 3), keepdims=True)
    # two-pass variance: E[(x-m)^2], not E[x^2]-E[x]^2 — the latter
    # cancels catastrophically once |mean| >> std (a drifting channel)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 3), keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = ((x32 - mean) * rstd).reshape(b, t, c)
    out = xhat * scale + bias
    return out.astype(x.dtype), (x, mean, rstd, scale)


def _group_norm_bwd(num_groups, eps, res, dy):
    x, mean, rstd, scale = res
    b, t, c = x.shape
    g = num_groups
    dy32 = dy.astype(jnp.float32)
    xhat = ((x.astype(jnp.float32).reshape(b, t, g, c // g) - mean) * rstd
            ).reshape(b, t, c)
    dscale = jnp.sum(dy32 * xhat, axis=(0, 1))
    dbias = jnp.sum(dy32, axis=(0, 1))
    gg = (dy32 * scale).reshape(b, t, g, c // g)
    xh = xhat.reshape(b, t, g, c // g)
    dx = rstd * (gg - jnp.mean(gg, axis=(1, 3), keepdims=True)
                 - xh * jnp.mean(gg * xh, axis=(1, 3), keepdims=True))
    return dx.reshape(b, t, c).astype(x.dtype), dscale, dbias


_group_norm_affine.defvjp(_group_norm_fwd, _group_norm_bwd)


class GroupNorm(nn.Module):
    """GroupNorm over ``(B, T, C)`` with torch semantics (normalize over
    (T, channels-in-group); eps 1e-5).

    The reference applies ``GroupNorm(512, 512)`` — i.e. per-channel instance
    norm over time — on the first conv block only
    (/root/reference/audio8/wav2vec2.py:417-423).
    """

    num_groups: int
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """``mask``: optional (B, T) validity mask. When given, statistics
        are computed over VALID frames only, making outputs independent of
        zero-padding. (torch GroupNorm — and therefore the reference, which
        feeds padded batches — includes padding in the statistics, so its
        outputs change with batch composition; masked stats match the
        exact-length forward instead. Deviation documented in
        docs/PARITY.md.)"""
        b, t, c = x.shape
        scale = self.param("scale", nn.initializers.ones_init(), (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), self.param_dtype)
        g = self.num_groups
        if mask is None:
            # fast path: fused fwd + algebraic custom-VJP backward
            y = _group_norm_affine(x, scale.astype(jnp.float32),
                                   bias.astype(jnp.float32), g, self.epsilon)
            return y.astype(self.dtype)
        x32 = x.astype(jnp.float32).reshape(b, t, g, c // g)
        m = mask.astype(jnp.float32)[:, :, None, None]
        count = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0) * (c // g)
        mean = jnp.sum(x32 * m, axis=(1, 3), keepdims=True) / count
        var = jnp.sum(jnp.square((x32 - mean) * m), axis=(1, 3), keepdims=True) / count
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y.reshape(b, t, c)
        y = y * mask.astype(jnp.float32)[:, :, None]
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(self.dtype)


class PositionalConv(nn.Module):
    """Grouped convolutional positional embedding with weight normalization.

    TPU-native equivalent of the reference's weight-normed ``Conv1DSame``
    pos-conv (/root/reference/audio8/wav2vec2.py:599-609): conv(d, d, k=128,
    groups=16), kernel weight-normalized per-tap (torch ``weight_norm`` with
    ``dim=2``), GELU activation. Follows fairseq padding semantics for even
    kernels: pad k//2 both sides, drop the trailing output frame.

    Params: ``weight_v`` ``(K, C_in/groups, C_out)``, ``weight_g`` ``(K, 1, 1)``,
    ``bias`` ``(C_out,)``. At inference the normalized weight can be folded
    (see :func:`audio8_tpu.models.convert.fold_weight_norm`).
    """

    features: int
    kernel_size: int = 128
    groups: int = 16
    dropout_rate: float = 0.1  # only used to scale init, as in the reference
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        std = math.sqrt((4.0 * (1.0 - self.dropout_rate)) / (self.kernel_size * self.features))

        def _v_init(key, shape, dtype):
            return jax.random.normal(key, shape, dtype) * std

        v = self.param(
            "weight_v",
            _v_init,
            (self.kernel_size, c_in // self.groups, self.features),
            self.param_dtype,
        )

        def _g_init(key, shape, dtype):
            # weight_norm initializes g = ||v|| so the initial effective
            # weight equals v.
            return jnp.linalg.norm(
                v.astype(jnp.float32), axis=(1, 2), keepdims=True
            ).astype(dtype)

        g = self.param("weight_g", _g_init, (self.kernel_size, 1, 1), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype)

        v32 = v.astype(jnp.float32)
        norm = jnp.linalg.norm(v32, axis=(1, 2), keepdims=True)
        kernel = (g.astype(jnp.float32) * v32 / (norm + 1e-12)).astype(self.dtype)

        pad = self.kernel_size // 2
        y = grouped_conv1d(x.astype(self.dtype), kernel,
                           1, ((pad, pad),), self.groups)
        if self.kernel_size % 2 == 0:
            y = y[:, :-1, :]
        y = y + bias.astype(self.dtype)
        return gelu(y)
