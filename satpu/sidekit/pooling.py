"""Statistics pooling layers (reference satools/satools/sidekit/pooling.py).

Inputs are channels-last: [B, T, C] (1D trunks) or [B, F, T, C] (ResNets).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

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
