"""ASV backbone architectures (reference satools/satools/sidekit/archi.py).

Inputs are mel features [B, T, n_mels]; ResNets view them as NHWC images with
H = n_mels (the reference permutes to [B, 1, F, T]; we use [B, F, T, 1] —
identical arithmetic, channels-last for TPU).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..models.torchlayers import BatchNorm, Conv1d, Conv2d
from .nn import Conv1dReluBn, ResNetBasicBlock, SERes2Block


class _ResNetStage(nn.Module):
    in_planes: int
    planes: int
    num_blocks: int
    stride: Tuple[int, int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = self.in_planes
        strides = [self.stride] + [(1, 1)] * (self.num_blocks - 1)
        for i, st in enumerate(strides):
            x = ResNetBasicBlock(inp, self.planes, st, name=f"{i}")(x, train=train)
            inp = self.planes
        return x


class PreResNet34(nn.Module):
    """archi.py:34-78. Input [B, T, F] -> NHWC [B, F, T', C]."""

    num_blocks: Sequence[int] = (3, 1, 3, 1, 5, 1, 2)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.transpose(x, (0, 2, 1))[..., None]  # [B, F, T, 1]
        x = Conv2d(1, 128, 3, 1, 1, use_bias=False, name="conv1")(x)
        x = nn.relu(BatchNorm(128, name="bn1")(x, train=train))
        planes = [128, 128, 128, 256, 256, 256, 256]
        strides = [(1, 1), (2, 2), (1, 1), (2, 2), (1, 1), (2, 2), (1, 1)]
        nblocks = list(self.num_blocks)[:6] + [self.num_blocks[5]]
        inp = 128
        for i in range(7):
            x = _ResNetStage(inp, planes[i], nblocks[i], strides[i],
                             name=f"layer{i + 1}")(x, train=train)
            inp = planes[i]
        return x


class PreHalfResNet34(nn.Module):
    """archi.py:81-119."""

    num_blocks: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.transpose(x, (0, 2, 1))[..., None]
        x = Conv2d(1, 32, 3, 1, 1, use_bias=False, name="conv1")(x)
        x = nn.relu(BatchNorm(32, name="bn1")(x, train=train))
        planes = [32, 64, 128, 256]
        strides = [(1, 1), (2, 2), (2, 2), (2, 2)]
        inp = 32
        for i in range(4):
            x = _ResNetStage(inp, planes[i], self.num_blocks[i], strides[i],
                             name=f"layer{i + 1}")(x, train=train)
            inp = planes[i]
        return x


class PreFastResNet34(nn.Module):
    """archi.py:122-159."""

    num_blocks: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.transpose(x, (0, 2, 1))[..., None]
        x = Conv2d(1, 16, 7, (1, 2), 3, use_bias=False, name="conv1")(x)
        x = nn.relu(BatchNorm(16, name="bn1")(x, train=train))
        planes = [16, 32, 64, 128]
        strides = [(1, 1), (2, 2), (2, 2), (1, 1)]
        inp = 16
        for i in range(4):
            x = _ResNetStage(inp, planes[i], self.num_blocks[i], strides[i],
                             name=f"layer{i + 1}")(x, train=train)
            inp = planes[i]
        return x


class PreEcapaTDNN(nn.Module):
    """ECAPA-TDNN trunk (archi.py:163-189). Input [B, T, F] -> [B, T, 3*C]."""

    in_feature: int = 80
    channels: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.channels
        out1 = Conv1dReluBn(self.in_feature, c, 5, padding=2, name="layer1")(x, train=train)
        out2 = SERes2Block(c, 3, 1, 2, 2, 8, name="layer2")(out1, train=train) + out1
        out3 = SERes2Block(c, 3, 1, 3, 3, 8, name="layer3")(out1 + out2, train=train) + out1 + out2
        out4 = (SERes2Block(c, 3, 1, 4, 4, 8, name="layer4")(out1 + out2 + out3, train=train)
                + out1 + out2 + out3)
        out = jnp.concatenate([out2, out3, out4], axis=-1)
        out = nn.relu(Conv1d(c * 3, c * 3, 1, name="conv")(out))
        return out
