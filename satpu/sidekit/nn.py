"""ASV building blocks (reference satools/satools/sidekit/nn.py), flax.

Channels-last layouts: 1D blocks take [B, T, C]; 2D blocks take NHWC.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..models.torchlayers import BatchNorm, Conv1d, Conv2d, Linear


class SELayer(nn.Module):
    """Squeeze-excitation over NHWC (sidekit/nn.py:12-32)."""

    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jnp.mean(x, axis=(1, 2))  # [B, C]
        y = nn.relu(Linear(self.channel, self.channel // self.reduction,
                           use_bias=False, name="fc_0")(y))
        y = nn.sigmoid(Linear(self.channel // self.reduction, self.channel,
                              use_bias=False, name="fc_2")(y))
        return x * y[:, None, None, :]


class ResNetBasicBlock(nn.Module):
    """SE-ResNet basic block (sidekit/nn.py:35-68). NHWC."""

    in_planes: int
    planes: int
    stride: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        st = self.stride if isinstance(self.stride, tuple) else (self.stride, self.stride)
        out = Conv2d(self.in_planes, self.planes, 3, st, 1, use_bias=False,
                     name="conv1")(x)
        out = nn.relu(BatchNorm(self.planes, name="bn1")(out, train=train))
        out = Conv2d(self.planes, self.planes, 3, 1, 1, use_bias=False, name="conv2")(out)
        out = BatchNorm(self.planes, name="bn2")(out, train=train)
        out = SELayer(self.planes, name="se")(out)
        if st != (1, 1) or self.in_planes != self.planes:
            sc = Conv2d(self.in_planes, self.planes, 1, st, 0, use_bias=False,
                        name="shortcut_0")(x)
            sc = BatchNorm(self.planes, name="shortcut_1")(sc, train=train)
        else:
            sc = x
        return nn.relu(out + sc)


class Conv1dReluBn(nn.Module):
    """conv -> relu -> BN (sidekit/nn.py:114-123). [B, T, C]."""

    in_channels: int
    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = Conv1d(self.in_channels, self.out_channels, self.kernel_size,
                   self.stride, self.padding, self.dilation, use_bias=False,
                   name="conv")(x)
        return BatchNorm(self.out_channels, name="bn")(nn.relu(y), train=train)


class Res2Conv1dReluBn(nn.Module):
    """Res2Net-style grouped temporal convs (sidekit/nn.py:75-110). [B, T, C]."""

    channels: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    scale: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        width = self.channels // self.scale
        nums = self.scale if self.scale == 1 else self.scale - 1
        spx = [x[..., i * width : (i + 1) * width] for i in range(self.scale)]
        out = []
        sp = spx[0]
        for i in range(nums):
            if i >= 1:
                sp = sp + spx[i]
            sp = Conv1d(width, width, self.kernel_size, self.stride, self.padding,
                        self.dilation, use_bias=False, name=f"convs_{i}")(sp)
            sp = BatchNorm(width, name=f"bns_{i}")(nn.relu(sp), train=train)
            out.append(sp)
        if self.scale != 1:
            out.append(spx[nums])
        return jnp.concatenate(out, axis=-1)


class SEConnect(nn.Module):
    """1D squeeze-excitation (sidekit/nn.py:127-141). [B, T, C]."""

    channels: int
    s: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = jnp.mean(x, axis=1)  # [B, C]
        out = nn.relu(Linear(self.channels, self.channels // self.s, name="linear1")(out))
        out = nn.sigmoid(Linear(self.channels // self.s, self.channels, name="linear2")(out))
        return x * out[:, None, :]


class SERes2Block(nn.Module):
    """SE-Res2Block (sidekit/nn.py:145-154); residual added by the caller."""

    channels: int
    kernel_size: int
    stride: int
    padding: int
    dilation: int
    scale: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = Conv1dReluBn(self.channels, self.channels, 1, 1, 0, name="block_0")(x, train=train)
        y = Res2Conv1dReluBn(self.channels, self.kernel_size, self.stride,
                             self.padding, self.dilation, self.scale,
                             name="block_1")(y, train=train)
        y = Conv1dReluBn(self.channels, self.channels, 1, 1, 0, name="block_2")(y, train=train)
        return SEConnect(self.channels, name="block_3")(y)
