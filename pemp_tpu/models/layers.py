"""Shared Flax building blocks: torch-convention conv/pool/norm + heads.

All modules are NHWC (TPU-native layout; XLA maps the convolutions onto the
MXU directly). Numeric conventions mirror the reference backbones
(reference: networks/backbones.py) so converted torchvision weights are
drop-in:

- convolutions use explicit symmetric padding (torch ``padding=p``),
- max pooling pads with -inf (torch semantics),
- BatchNorm: eps 1e-5, running stats updated with torch momentum 0.1
  (flax momentum 0.9); "frozen BN" keeps using batch statistics in train
  mode with non-trainable affine params — trainability is enforced by the
  optimizer mask (pemp_tpu/core/solver.py), exactly like the reference's
  ``requires_grad=False`` (backbones.py:56-62).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from pemp_tpu.ops.dropblock import dropblock_2d
from pemp_tpu.ops.dtypes import f32up

Dtype = Any


def kaiming_normal_relu():
    """torch ``nn.init.kaiming_normal_(nonlinearity='relu')`` (fan_in)."""
    return nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def torch_conv_default_init():
    """torch Conv2d default: kaiming_uniform with a=sqrt(5) == uniform
    variance scaling with gain 1/3 (fan_in)."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """torch Conv2d/Linear default bias: U(-1/sqrt(fan_in), +1/sqrt(fan_in))
    (flax defaults biases to zeros — a random-init parity difference for
    every scratch-trained head)."""
    import jax
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


# Experiment hook (tools/exp_train_levers.py): when set, every Conv
# routes its compute through CONV_IMPL(x, kernel, strides, padding,
# dilation) instead of flax nn.Conv — used to A/B alternate conv
# lowerings (space-to-batch dilated schedule, weight-grad accumulation
# dtype) against the production path with an IDENTICAL param tree.
# Production leaves this None; the entries never touch it.
CONV_IMPL = None


class _HookedConv(nn.Module):
    """nn.Conv-compatible conv (same param tree: f32 ``kernel`` [kh, kw,
    cin, cout] + ``bias`` [cout], same promote-to-``dtype`` compute, bias
    added after the conv) whose windowed compute is delegated to the
    module-level ``CONV_IMPL`` experiment hook."""
    features: int
    kernel: Tuple[int, int]
    stride: int
    padding: int
    dilation: int
    use_bias: bool
    dtype: Dtype
    kernel_init: Callable
    bias_init: Callable

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, x.shape[-1], self.features),
                            jnp.float32)
        x = x.astype(self.dtype)
        p = self.padding
        y = CONV_IMPL(x, kernel.astype(self.dtype),
                      (self.stride, self.stride), ((p, p), (p, p)),
                      (self.dilation, self.dilation))
        if self.use_bias:
            bias = self.param("bias", self.bias_init,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class Conv(nn.Module):
    """Conv2d with torch padding/dilation conventions, NHWC."""
    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = torch_conv_default_init()

    @nn.compact
    def __call__(self, x):
        p = self.padding
        fan_in = self.kernel[0] * self.kernel[1] * x.shape[-1]
        if CONV_IMPL is not None:
            return _HookedConv(
                self.features, self.kernel, self.stride, self.padding,
                self.dilation, self.use_bias, self.dtype,
                self.kernel_init, torch_bias_init(fan_in),
                name="Conv_0")(x)   # nn.Conv's auto-name: same tree
        return nn.Conv(
            self.features, self.kernel,
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init,
            bias_init=torch_bias_init(fan_in),
        )(x)


class _TorchBatchNorm(nn.Module):
    """torch-exact BatchNorm2d core (instantiated as ``BatchNorm_0`` to
    keep the flax auto-name tree layout of the nn.BatchNorm it replaced).

    Differences vs flax ``nn.BatchNorm`` that matter for training-dynamics
    parity with the reference (torch ``_BatchNorm.forward``):
    - the running variance is updated with the UNBIASED batch variance
      (``n/(n-1)`` correction) while normalization uses the biased one;
    - batch statistics use the two-pass ``E[(x-mean)^2]`` form (torch),
      not flax's fast ``E[x^2]-E[x]^2``.
    """
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            xf = f32up(x)
            red = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=red)
            var = jnp.mean(jnp.square(xf - mean), axis=red)
            if not self.is_initializing():
                n = x.size // c
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                ra_var.value = 0.9 * ra_var.value + 0.1 * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (f32up(x) - mean) * lax.rsqrt(var + 1e-5)
        return (y * scale + bias).astype(self.dtype)


class BatchNorm(nn.Module):
    """BatchNorm2d with torch defaults. ``train=True`` uses batch stats and
    updates running stats (torch ``.train()``), ``train=False`` uses the
    running stats."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return _TorchBatchNorm(dtype=self.dtype, name="BatchNorm_0")(x, train)


def max_pool_torch(x: jnp.ndarray, kernel: int, stride: int, padding: int,
                   ceil_mode: bool = False) -> jnp.ndarray:
    """torch MaxPool2d on NHWC input, including ``ceil_mode``."""
    h, w = x.shape[-3], x.shape[-2]
    pad_h = pad_w = (padding, padding)
    if ceil_mode:
        def extra(size):
            rem = (size + 2 * padding - kernel) % stride
            return (stride - rem) % stride if rem else 0
        # torch ceil_mode only adds an output if the window starts inside
        # the (left-padded) input; k=3,p=1 windows always do.
        pad_h = (padding, padding + extra(h))
        pad_w = (padding, padding + extra(w))
    # init must be a concrete scalar for XLA's max-pool autodiff rule
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else \
        jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x, neg_inf, lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), pad_h, pad_w, (0, 0)),
    )


def avg_pool_full(x: jnp.ndarray) -> jnp.ndarray:
    """Global average pool to [N, 1, 1, C] (adaptive_avg_pool2d(1))."""
    return jnp.mean(x, axis=(-3, -2), keepdims=True)


class Dropout2d(nn.Module):
    """Channel dropout (torch nn.Dropout2d): whole feature maps zeroed."""
    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.Dropout(self.rate, broadcast_dims=(1, 2),
                          deterministic=not train)(x)


class DropBlock(nn.Module):
    """DropBlock2D module wrapper over pemp_tpu.ops.dropblock."""
    rate: float
    block_size: int

    @nn.compact
    def __call__(self, x, train: bool):
        if not train or self.rate == 0.0:
            return x
        return dropblock_2d(self.make_rng("dropout"), x,
                            self.rate, self.block_size)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling head with channel dropout
    (reference: networks/backbones.py:279-321)."""
    inc: int = 256
    midc: int = 256
    outc: int = 512
    drop_rate: float = 0.5
    tail: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        h, w = x.shape[-3], x.shape[-2]
        g = avg_pool_full(x)
        g = Conv(self.midc, (1, 1), dtype=self.dtype, name="aspp_0")(g)
        g = nn.relu(g)
        g = Dropout2d(self.drop_rate, name="aspp_0_drop")(g, train)
        g = jnp.broadcast_to(g, (*x.shape[:-3], h, w, self.midc))

        branches = [g]
        for i, (ksize, dil) in enumerate([((1, 1), 1), ((3, 3), 6),
                                          ((3, 3), 12), ((3, 3), 18)], start=1):
            pad = dil if ksize == (3, 3) else 0
            b = Conv(self.midc, ksize, padding=pad, dilation=dil,
                     dtype=self.dtype, name=f"aspp_{i}")(x)
            b = nn.relu(b)
            b = Dropout2d(self.drop_rate, name=f"aspp_{i}_drop")(b, train)
            branches.append(b)
        out = jnp.concatenate(branches, axis=-1)
        if self.tail:
            out = Conv(self.outc, (1, 1), dtype=self.dtype, name="layer6")(out)
        return out


class ASPPV2(nn.Module):
    """ASPP variant with BatchNorm + DropBlock per branch
    (reference: networks/backbones.py:324-369). These BNs are trainable
    (only backbone BNs are frozen)."""
    inc: int = 256
    midc: int = 256
    outc: int = 512
    drop_rate: float = 0.1
    block_size: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        h, w = x.shape[-3], x.shape[-2]

        def branch(inp, ksize, dil, name):
            b = BatchNorm(dtype=self.dtype, name=f"{name}_bn")(inp, train)
            b = DropBlock(self.drop_rate, self.block_size,
                          name=f"{name}_dropblock")(b, train)
            pad = dil if ksize == (3, 3) else 0
            b = Conv(self.midc, ksize, padding=pad, dilation=dil,
                     dtype=self.dtype, name=f"{name}_conv")(b)
            return nn.relu(b)

        g = branch(avg_pool_full(x), (1, 1), 1, "aspp_0")
        g = jnp.broadcast_to(g, (*x.shape[:-3], h, w, self.midc))
        out = jnp.concatenate([
            g,
            branch(x, (1, 1), 1, "aspp_1"),
            branch(x, (3, 3), 6, "aspp_2"),
            branch(x, (3, 3), 12, "aspp_3"),
            branch(x, (3, 3), 18, "aspp_4"),
        ], axis=-1)
        return Conv(self.outc, (1, 1), dtype=self.dtype, name="layer6")(out)
