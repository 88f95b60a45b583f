"""Plain conv/linear/norm layers with torch parameter layouts.

satpu stores parameters in the reference's torch layouts (conv [out, in, k],
linear [out, in]) so reference checkpoints convert by pure name remapping; the
relayout to XLA's channels-last compute form happens inside the call and is
free at compile time. Inputs are channels-last ([B, T, C] / [B, H, W, C]).
"""
from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _kaiming_uniform(key, shape, fan_in):
    bound = float(np.sqrt(1.0 / fan_in)) * float(np.sqrt(3.0))
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


# Trace-time mixed-precision policy: the TPU analog of the reference's
# torch.amp.autocast (sidekit/objf.py:57, tuning/hifigan.py:99). Inside an
# ``autocast(jnp.bfloat16)`` block, Conv1d/Conv2d/Linear cast inputs and
# weights to the compute dtype (params stay f32 master copies — the cast is
# in-graph, so gradients accumulate back to f32), while BatchNorm always
# computes and returns f32, matching torch autocast's fp32 op list. The
# context is consulted when the layer is *traced*, so wrap the model.apply
# inside the jitted step.
_AUTOCAST: contextvars.ContextVar = contextvars.ContextVar(
    "satpu_autocast_dtype", default=None)


@contextlib.contextmanager
def autocast(dtype: Optional[jnp.dtype]):
    """Run layer tracing under a compute dtype (None = no-op)."""
    token = _AUTOCAST.set(jnp.dtype(dtype) if dtype is not None else None)
    try:
        yield
    finally:
        _AUTOCAST.reset(token)


def _autocast_pair(x, w):
    dt = _AUTOCAST.get()
    if dt is not None and jnp.issubdtype(x.dtype, jnp.floating):
        return x.astype(dt), w.astype(dt)
    return x, w


class Conv1d(nn.Module):
    """torch nn.Conv1d with weight [out, in/groups, k]; input [B, T, C]."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shape = (self.out_channels, self.in_channels // self.groups, self.kernel_size)
        fan_in = shape[1] * shape[2]
        w = self.param("weight", lambda k, s: _kaiming_uniform(k, s, fan_in), shape)
        kernel = jnp.transpose(w, (2, 1, 0))
        x, kernel = _autocast_pair(x, kernel)
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.groups)
        if self.use_bias:
            b = self.param("bias", lambda k, s: _kaiming_uniform(k, s, fan_in),
                           (self.out_channels,))
            y = y + b.astype(y.dtype)
        return y


class Conv2d(nn.Module):
    """torch nn.Conv2d with weight [out, in/groups, kh, kw]; input NHWC."""

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ks = (self.kernel_size,) * 2 if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        st = (self.stride,) * 2 if isinstance(self.stride, int) else tuple(self.stride)
        pd = (self.padding,) * 2 if isinstance(self.padding, int) else tuple(self.padding)
        shape = (self.out_channels, self.in_channels // self.groups) + ks
        fan_in = shape[1] * ks[0] * ks[1]
        w = self.param("weight", lambda k, s: _kaiming_uniform(k, s, fan_in), shape)
        kernel = jnp.transpose(w, (2, 3, 1, 0))
        x, kernel = _autocast_pair(x, kernel)
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=st,
            padding=[(pd[0], pd[0]), (pd[1], pd[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups)
        if self.use_bias:
            b = self.param("bias", lambda k, s: _kaiming_uniform(k, s, fan_in),
                           (self.out_channels,))
            y = y + b.astype(y.dtype)
        return y


class Linear(nn.Module):
    """torch nn.Linear with weight [out, in]."""

    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", lambda k, s: _kaiming_uniform(k, s, self.in_features),
                       (self.out_features, self.in_features))
        x, w = _autocast_pair(x, w)
        y = jnp.einsum("...i,oi->...o", x, w)
        if self.use_bias:
            b = self.param("bias", lambda k, s: _kaiming_uniform(k, s, self.in_features),
                           (self.out_features,))
            y = y + b.astype(y.dtype)
        return y


class BatchNorm(nn.Module):
    """torch BatchNorm{1,2}d over the channels-last axis (affine by default).

    Parameter names match torch (weight/bias; running stats in 'batch_stats'
    as mean/var) so converters are pure remaps.
    """

    num_features: int
    use_affine: bool = True
    momentum: float = 0.1  # torch convention
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # f32 op under autocast (torch amp keeps batch_norm in fp32): stats
        # and output stay f32; downstream layers re-cast as needed.
        x = x.astype(jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.num_features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.num_features,)))
        reduce_axes = tuple(range(x.ndim - 1))
        if train and not self.is_initializing():
            mean = jnp.mean(x, axis=reduce_axes)
            var = jnp.var(x, axis=reduce_axes)
            n = np.prod([x.shape[i] for i in reduce_axes])
            unbiased = var * n / max(n - 1, 1)
            ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
            ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        if self.use_affine:
            w = self.param("weight", nn.initializers.ones, (self.num_features,))
            b = self.param("bias", nn.initializers.zeros, (self.num_features,))
            y = y * w + b
        return y


def instance_norm_1d(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch InstanceNorm1d (affine=False) on channels-last [B, T, C]:
    per-(B, C) normalization over T."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)
