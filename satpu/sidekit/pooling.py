"""Statistics pooling layers (reference satools/satools/sidekit/pooling.py).

Inputs are channels-last: [B, T, C] (1D trunks) or [B, F, T, C] (ResNets).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.torchlayers import BatchNorm, Conv1d


def _flatten_resnet(x: jnp.ndarray) -> jnp.ndarray:
    """[B, F, T, C] -> [B, T, C*F] matching the reference's
    permute+flatten([B, C, F, T] -> [B, C*F, T]) channel order."""
    if x.ndim == 4:
        B, F, T, C = x.shape
        x = jnp.transpose(x, (0, 2, 3, 1))  # [B, T, C, F]
        x = x.reshape(B, T, C * F)
    return x


class MeanStdPooling(nn.Module):
    """Mean + (unbiased) std over time (pooling.py:11-37)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _flatten_resnet(x)
        mean = jnp.mean(x, axis=1)
        std = jnp.std(x, axis=1, ddof=1)
        return jnp.concatenate([mean, std], axis=-1)


class AttentiveStatsPool(nn.Module):
    """ECAPA attentive stats pooling (pooling.py:141-155). [B, T, C]."""

    in_dim: int
    bottleneck_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = jnp.tanh(Conv1d(self.in_dim, self.bottleneck_dim, 1, name="linear1")(x))
        alpha = nn.softmax(Conv1d(self.bottleneck_dim, self.in_dim, 1, name="linear2")(alpha),
                           axis=1)
        mean = jnp.sum(alpha * x, axis=1)
        residuals = jnp.sum(alpha * x**2, axis=1) - mean**2
        std = jnp.sqrt(jnp.clip(residuals, min=1e-9))
        return jnp.concatenate([mean, std], axis=-1)


class AttentivePooling(nn.Module):
    """Attentive mean+std pooling with optional global context
    (pooling.py:90-138)."""

    num_channels: int
    num_freqs: int = 10
    attention_channels: int = 128
    global_context: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = _flatten_resnet(x)  # [B, T, C*F]
        cf = self.num_channels * self.num_freqs
        if self.global_context:
            mean = jnp.mean(x, axis=1, keepdims=True)
            std = jnp.std(x, axis=1, ddof=1, keepdims=True)
            gc = jnp.concatenate([mean, std], axis=-1)
            ctx = jnp.broadcast_to(gc, (x.shape[0], x.shape[1], gc.shape[-1]))
            inp = jnp.concatenate([x, ctx], axis=-1)
            in_dim = cf * 3
        else:
            inp, in_dim = x, cf
        w = Conv1d(in_dim, self.attention_channels, 1, name="attention_0")(inp)
        w = nn.relu(w)
        w = BatchNorm(self.attention_channels, name="attention_2")(w, train=train)
        w = jnp.tanh(w)
        w = Conv1d(self.attention_channels, cf, 1, name="attention_4")(w)
        w = nn.softmax(w, axis=1)
        mu = jnp.sum(x * w, axis=1)
        rh = jnp.sqrt(jnp.clip(jnp.sum((x**2) * w, axis=1) - mu**2, min=1e-9))
        return jnp.concatenate([mu, rh], axis=-1)


class GruPooling(nn.Module):
    """GRU-based pooling (pooling.py:158-190). [B, T, C] -> [B, gru_node]."""

    input_size: int
    gru_node: int
    nb_gru_layer: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = BatchNorm(self.input_size, name="bn_before_gru")(x, train=train)
        x = nn.leaky_relu(x, negative_slope=0.3)
        for layer in range(self.nb_gru_layer):
            cell = nn.GRUCell(features=self.gru_node, name=f"gru_l{layer}")
            x = nn.RNN(cell, name=f"rnn_l{layer}")(x)
        return x[:, -1, :]


class ChannelWiseCorrPooling(nn.Module):
    """Channel-wise correlation pooling (pooling.py:40-88): project grouped
    (channel x merged-freq) maps, normalize over locations, and emit the
    lower-triangular channel correlations per frequency group.

    Input [B, T, F, C] (resnet NHWC); output [B, groups * C'*(C'-1)/2].
    """

    in_channels: int = 256
    out_channels: int = 64
    in_freqs: int = 10
    channels_dropout: float = 0.25
    merge_freqs_count: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert self.in_freqs % self.merge_freqs_count == 0
        groups = self.in_freqs // self.merge_freqs_count
        B, T, F, C = x.shape
        num_locations = (T * F) / groups
        if train and self.channels_dropout > 0:
            mask = jax.random.bernoulli(
                self.make_rng("augment"), 1.0 - self.channels_dropout, (1, 1, 1, C))
            x = x * mask / (1.0 - self.channels_dropout)
        # [B, T, C, Fr, f] -> [B, T, f, Fr, C] -> [B, Fr*C, T, f] grouped 1x1
        x = jnp.transpose(x, (0, 1, 3, 2))  # [B, T, C, F]
        x = x.reshape(B, T, C, groups, self.merge_freqs_count)
        x = jnp.transpose(x, (0, 1, 4, 3, 2))  # [B, T, f, Fr, C]
        # grouped 1x1 projection C -> C' per freq group (torch Conv2d groups)
        w = self.param("proj", nn.initializers.lecun_normal(),
                       (groups, C, self.out_channels))
        b = self.param("proj_bias", nn.initializers.zeros,
                       (groups, self.out_channels))
        y = jnp.einsum("btfgc,gco->btfgo", x, w) + b  # [B, T, f, Fr, C']
        # [B, Fr, C', T*f]
        y = jnp.transpose(y, (0, 3, 4, 1, 2)).reshape(B, groups, self.out_channels, -1)
        y = y - jnp.mean(y, axis=-1, keepdims=True)
        y = y / (jnp.std(y, axis=-1, keepdims=True) + 1e-5)
        corr = jnp.einsum("abci,abdi->abcd", y, y)  # [B, Fr, C', C']
        tril = np.tril(np.ones((self.out_channels, self.out_channels), bool), -1)
        out = corr[:, :, tril]  # [B, Fr, C'*(C'-1)/2]
        return out.reshape(B, -1) / num_locations
