"""TDNN-F (factorized TDNN) layer zoo in flax.linen.

TPU-native rebuild of the reference layer zoo (satools/satools/chain/nn.py):

- ``NaturalAffineTransform``  (chain/nn.py:54-137) — plain affine here; the
  NG-SGD preconditioning lives in the optimizer (satpu.chain.ngsgd), not in a
  custom autograd function.
- ``OrthonormalLinear``       (chain/nn.py:165-185) — the orthonormal
  constraint is a pure parameter update applied between steps
  (``constrain_orthonormal_tree``), matching Kaldi's floating/fixed scale
  semantics (chain/nn.py:140-162).
- ``TDNNF`` / ``TDNNFBatchNorm`` (chain/nn.py:197-347) — the unfold-based
  context splicing with fractional 1.5 subsampling is reproduced exactly
  (including the reference's flattened-feature stagger for 1.5) so converted
  reference checkpoints are bit-compatible; splicing is a static gather that
  XLA lowers to strided slices.
- ``VectorQuantizerEMA``      (chain/nn.py:351-503) — EMA codebook kept in a
  mutable 'vq_stats' collection; the straight-through estimator and
  perplexity match the reference.
- ``RevGrad`` gradient-reversal (chain/nn.py:506-519).

Torch-compatible parameter layouts (weight [out, in]) are used so reference
checkpoints convert 1:1.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def get_padding(kernel_sizes: Sequence[int], subsampling_factors: Sequence[float]) -> int:
    """Total context consumed by a TDNNF stack (chain/model.py:466-473)."""
    pad = 0
    global_subsampling = 1.0
    for k, s in zip(kernel_sizes, subsampling_factors):
        pad += (k - 1) * global_subsampling
        global_subsampling *= s
    return int(pad)


def pad_input_replicate(x: jnp.ndarray, pad_amount: int) -> jnp.ndarray:
    """Replicate first/last frame pad_amount times (tuning/tdnnf.py:148-154)."""
    if pad_amount <= 0:
        return x
    left = jnp.repeat(x[:, :1, :], pad_amount, axis=1)
    right = jnp.repeat(x[:, -1:, :], pad_amount, axis=1)
    return jnp.concatenate([left, x, right], axis=1)


def mask_replicate_tail(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Replace frames past each utterance's valid length with its last valid
    frame: x[b, t] = x[b, min(t, len_b - 1)].

    This makes a zero-padded batch behave like per-utterance replicate edge
    padding, so one compiled program per BUCKET (not per exact length) yields
    the same valid-frame outputs — the static-shape recipe of SURVEY.md §5.7.
    x: [B, T, ...]; lengths: [B] valid frame counts."""
    T = x.shape[1]
    idx = jnp.minimum(jnp.arange(T)[None, :], jnp.maximum(lengths[:, None] - 1, 0))
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)).astype(jnp.int32), axis=1)


def splice_frames(x: jnp.ndarray, context_len: int, subsampling_factor: float) -> jnp.ndarray:
    """The reference's unfold splicing (chain/nn.py:268-273).

    x: [B, T, D] -> [B, nwin, D*context_len] where window j starts at element
    ``j * int(D*subsampling_factor)`` of the flattened [T*D] sequence. For the
    fractional factor 1.5 this staggers windows across frame boundaries,
    exactly as torch.unfold does on the flattened tensor.
    """
    B, T, D = x.shape
    step = int(D * subsampling_factor)
    win = D * context_len
    nwin = (T * D - win) // step + 1
    if step % D == 0:
        # frame-aligned splicing: window j = frames [j*s, j*s + context_len)
        s = step // D
        cols = [x[:, c : c + (nwin - 1) * s + 1 : s, :] for c in range(context_len)]
        return jnp.concatenate(cols, axis=-1)
    flat = x.reshape(B, T * D)
    idx = (np.arange(nwin) * step)[:, None] + np.arange(win)[None, :]
    return flat[:, jnp.asarray(idx)]


class NaturalAffineTransform(nn.Module):
    """Affine layer with torch layout weight [out, in], bias [1, out]
    (chain/nn.py:54-137).

    With ``natural_gradient=True`` the layer runs through
    ``ngsgd.nat_affine``: the forward stays a pure matmul for the MXU, the
    backward emits raw gradients plus per-side Fisher statistics, and the
    chain train step preconditions all layers' gradients in one batched
    phase (Kaldi's online natural gradient; see
    ngsgd.precondition_gradients). The preconditioner states live in the
    mutable ``ng_state`` collection; the train step recovers the statistics
    from the gradient pytree (see satpu.chain.ngsgd docstring).
    """

    out_dim: int
    use_bias: bool = True
    natural_gradient: bool = False
    compute_dtype: str = "float32"  # "bfloat16" = MXU bf16 matmul, f32 out

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 splice: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
        """``splice=(context_len, stride)`` evaluates the layer on the
        context-spliced input WITHOUT materializing it: the [out, c*D] weight
        is reshaped into a width-c conv kernel and the splice+matmul runs as
        one VALID convolution over the raw [B, T, D] frames (identical
        arithmetic to ``splice_frames`` + matmul; XLA's conv backward then
        avoids the [B, T, c*D] unfolded-gradient materialization too — the
        two splice fusions were ~1.2 ms/layer of the B=64 chain step).
        Only valid on the plain-matmul path: the NG-SGD form needs the
        spliced rows themselves for its input-side Fisher statistics."""
        feat_dim = x.shape[-1] if splice is None else x.shape[-1] * splice[0]
        scale = 1.0 / math.sqrt(feat_dim * self.out_dim)
        weight = self.param(
            "weight", lambda key, shape: jax.random.normal(key, shape) * scale,
            (self.out_dim, feat_dim),
        )
        # engage NG only when the ng_state collection is live (training);
        # inference on an NG-trained checkpoint falls back to a plain matmul
        if (self.natural_gradient and self.use_bias and splice is None
                and (self.is_initializing() or self.has_variable("ng_state", "in"))):
            from ..chain.ngsgd import NG_HYPER, nat_affine, ng_init_arrays

            bias = self.param("bias", nn.initializers.normal(1.0), (1, self.out_dim))
            in_st = self.variable("ng_state", "in",
                                  lambda: ng_init_arrays(feat_dim + 1))
            out_st = self.variable("ng_state", "out",
                                   lambda: ng_init_arrays(self.out_dim))
            y2d = nat_affine(x.reshape(-1, feat_dim), weight, bias,
                             in_st.value, out_st.value,
                             hyper=NG_HYPER + (self.compute_dtype,))
            return y2d.reshape(*x.shape[:-1], self.out_dim)
        if splice is not None:
            c, s = splice
            # weight columns are tap-major ([0:D] = tap 0 ...), matching the
            # splice_frames concat order
            kernel = jnp.transpose(
                weight.reshape(self.out_dim, c, x.shape[-1]), (1, 2, 0))
            if self.compute_dtype == "bfloat16":
                x = x.astype(jnp.bfloat16)
                kernel = kernel.astype(jnp.bfloat16)
            elif x.dtype != kernel.dtype:  # upstream autocast handed bf16 in
                kernel = kernel.astype(x.dtype)
            # no preferred_element_type: the conv transpose (wgrad) rule
            # rejects its mixed-dtype cotangent; accumulate at the input
            # dtype (MXU still sums f32 internally) and upcast the result
            y = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(s,), padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC")).astype(jnp.float32)
        elif self.compute_dtype == "bfloat16":
            y = jnp.einsum("...i,oi->...o", x.astype(jnp.bfloat16),
                           weight.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        else:
            y = jnp.einsum("...i,oi->...o", x, weight)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.normal(1.0), (1, self.out_dim))
            y = y + bias[0]
        return y


class OrthonormalLinear(nn.Module):
    """NaturalAffineTransform whose weight is periodically re-orthonormalized
    by ``constrain_orthonormal_tree`` between training steps."""

    out_dim: int
    scale: float = 0.0
    use_bias: bool = True
    natural_gradient: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 splice: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
        return NaturalAffineTransform(self.out_dim, self.use_bias,
                                      natural_gradient=self.natural_gradient,
                                      compute_dtype=self.compute_dtype,
                                      name="inner_nat")(x, splice=splice)


def constrain_orthonormal(M: jnp.ndarray, scale: float, update_speed: float = 0.125) -> jnp.ndarray:
    """One step of Povey's orthonormal-constraint update (chain/nn.py:140-162).

    scale < 0 = floating scale (estimated from the matrix itself). Returns the
    updated matrix. Pure function of the parameter; apply between steps.
    """
    rows, cols = M.shape
    transposed = rows < cols
    W = M.T if transposed else M
    d = W.shape[0]
    P = W @ W.T
    if scale < 0.0:
        trace_P_Pt = jnp.sum(P**2)
        trace_P = jnp.trace(P)
        ratio = trace_P_Pt / trace_P
        scale_f = jnp.sqrt(ratio)
        ratio2 = ratio * d / trace_P
        speed = jnp.where(ratio2 > 1.1, update_speed * 0.25,
                          jnp.where(ratio2 > 1.02, update_speed * 0.5, update_speed))
        scale2 = scale_f**2
    else:
        speed = update_speed
        scale2 = scale**2
    P = P - scale2 * jnp.eye(d, dtype=M.dtype)
    W = W + (-4.0 * speed / scale2) * (P @ W)
    return W.T if transposed else W


def constrain_orthonormal_tree(params, constraints) -> Any:
    """Apply constrain_orthonormal to every (path, scale) in ``constraints``.

    ``constraints`` is a list of (tuple_path_to_weight, scale). Used by the
    trainers to mirror OrthonormalLinear's pre-forward side effect.
    """
    flat = dict(jax.tree_util.tree_flatten_with_path(params)[0])

    def visit(path, leaf):
        key = tuple(getattr(p, "key", getattr(p, "idx", None)) for p in path)
        for cpath, scale in constraints:
            if key == tuple(cpath):
                return constrain_orthonormal(leaf, scale)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


def find_orthonormal_constraints(params, scale: float = -1.0):
    """All linearB/inner_nat weights in a param tree -> [(path, scale)]."""
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = tuple(getattr(p, "key", getattr(p, "idx", None)) for p in path)
        if "inner_nat" in keys and keys[-1] == "weight":
            out.append((keys, scale))
    return out


class TDNNF(nn.Module):
    """Factorized TDNN layer (chain/nn.py:197-304)."""

    feat_dim: int
    output_dim: int
    bottleneck_dim: int
    context_len: int = 1
    subsampling_factor: float = 1
    orthonormal_constraint: float = 0.0
    bypass_scale: float = 0.66
    bottleneck_func: Optional[Callable] = None  # e.g. a VQ layer's apply
    natural_gradient: bool = False
    compute_dtype: str = "float32"

    def setup(self):
        self.linearB = OrthonormalLinear(
            self.bottleneck_dim, scale=self.orthonormal_constraint,
            natural_gradient=self.natural_gradient,
            compute_dtype=self.compute_dtype, name="linearB")
        self.linearA = NaturalAffineTransform(
            self.output_dim, natural_gradient=self.natural_gradient,
            compute_dtype=self.compute_dtype, name="linearA")
        self.use_bypass = self.bypass_scale > 0.0 and self.feat_dim == self.output_dim

    def _bypass(self, x: jnp.ndarray, inp: jnp.ndarray) -> jnp.ndarray:
        c = self.context_len
        s = self.subsampling_factor
        if s == 1.5:
            T = inp.shape[1]
            n = int(T / 1.5)
            idx = np.floor(np.arange(0, n) * 1.5).astype(np.int64)
            y = inp[:, jnp.asarray(idx), :] * self.bypass_scale
            tx, ty = x.shape[1], y.shape[1]
            if tx < ty:
                x = jnp.pad(x, ((0, 0), (0, ty - tx), (0, 0)))
            elif ty < tx:
                y = jnp.pad(y, ((0, 0), (0, tx - ty), (0, 0)))
            return x + y
        s = int(s)
        if c > 1:
            if c == 2:
                lidx, ridx = 1, None
            elif c % 2 == 1:
                lidx = c // 2
                ridx = -lidx
            else:
                lidx = c // 2
                ridx = -lidx + 1
        else:
            lidx, ridx = 0, None
        ident = inp[:, lidx:ridx:s, :]
        return x + ident[:, : x.shape[1]] * self.bypass_scale

    def __call__(self, x: jnp.ndarray, return_bottleneck: bool = False,
                 train: bool = False):
        inp = x
        s = self.subsampling_factor
        if not self.natural_gradient and float(s).is_integer():
            # splice-free path: the NG-off affine consumes raw frames through
            # a conv (see NaturalAffineTransform.__call__ splice docs)
            if self.context_len > 1:
                h = self.linearB(x, splice=(self.context_len, int(s)))
            else:
                h = self.linearB(x[:, :: int(s)] if int(s) > 1 else x)
        else:
            spliced = splice_frames(x, self.context_len, s)
            h = self.linearB(spliced)
        if self.bottleneck_func is not None:
            h = self.bottleneck_func(h, train=train)
        if return_bottleneck:
            return h
        h = self.linearA(h)
        if self.use_bypass:
            h = self._bypass(h, inp)
        return h


class TDNNFBatchNorm(nn.Module):
    """TDNNF + (non-affine) BatchNorm over features + ReLU (chain/nn.py:308-347)."""

    feat_dim: int
    output_dim: int
    bottleneck_dim: int
    context_len: int = 1
    subsampling_factor: float = 1
    orthonormal_constraint: float = 0.0
    bypass_scale: float = 0.66
    bottleneck_func: Optional[Callable] = None
    natural_gradient: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_bottleneck: bool = False,
                 train: bool = False):
        h = TDNNF(
            self.feat_dim, self.output_dim, self.bottleneck_dim,
            context_len=self.context_len, subsampling_factor=self.subsampling_factor,
            orthonormal_constraint=self.orthonormal_constraint,
            bypass_scale=self.bypass_scale, bottleneck_func=self.bottleneck_func,
            natural_gradient=self.natural_gradient,
            compute_dtype=self.compute_dtype,
            name="tdnn",
        )(x, return_bottleneck=return_bottleneck, train=train)
        if return_bottleneck:
            return h
        h = nn.BatchNorm(
            use_running_average=not train, use_bias=False, use_scale=False,
            momentum=0.9, epsilon=1e-5, axis=-1, name="bn",
        )(h)
        h = nn.relu(h)
        if self.compute_dtype == "bfloat16" and not train:
            # serving: store inter-layer activations bf16 — the next layer's
            # splice slices and matmul inputs stream half the HBM bytes (the
            # matmul casts to bf16 anyway; BN stats/affine stay f32)
            h = h.astype(jnp.bfloat16)
        return h


class VectorQuantizerEMA(nn.Module):
    """VQ-VAE quantizer with EMA codebook updates (chain/nn.py:351-503).

    Codebook + EMA accumulators live in the mutable 'vq_stats' collection so
    the forward stays pure; pass ``mutable=['vq_stats']`` during training.
    Returns (vq_loss, quantized, perplexity, indices).
    """

    num_embeddings: int
    embedding_dim: int
    commitment_cost: float = 0.25
    decay: float = 0.95
    epsilon: float = 1e-5
    freeze: bool = False

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, train: bool = False):
        emb = self.variable(
            "vq_stats", "embedding",
            lambda: jax.random.normal(self.make_rng("params") if self.has_rng("params")
                                      else jax.random.PRNGKey(0),
                                      (self.num_embeddings, self.embedding_dim)))
        ema_cluster_size = self.variable(
            "vq_stats", "ema_cluster_size", lambda: jnp.zeros((self.num_embeddings,)))
        ema_w = self.variable(
            "vq_stats", "ema_w",
            lambda: jax.random.normal(jax.random.PRNGKey(1),
                                      (self.num_embeddings, self.embedding_dim)))

        flat = inputs.reshape(-1, self.embedding_dim)
        # checkpoint-loaded variables arrive as numpy arrays; numpy fancy
        # indexing by a traced index array raises under jit, so lift to jnp
        w = jnp.asarray(emb.value)
        distances = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            + jnp.sum(w**2, axis=1)[None, :]
            - 2.0 * flat @ w.T
        )
        indices = jnp.argmin(distances, axis=1)

        if train and not self.freeze and not self.is_initializing():
            one_hot = jax.nn.one_hot(indices, self.num_embeddings, dtype=flat.dtype)
            cluster_size = jnp.sum(one_hot, axis=0)
            new_cs = ema_cluster_size.value * self.decay + (1 - self.decay) * cluster_size
            n = jnp.sum(new_cs)
            new_cs = (new_cs + self.epsilon) / (n + self.num_embeddings * self.epsilon) * n
            dw = one_hot.T @ flat
            new_ema_w = ema_w.value * self.decay + (1 - self.decay) * dw
            ema_cluster_size.value = new_cs
            ema_w.value = new_ema_w
            emb.value = new_ema_w / new_cs[:, None]
            w = emb.value

        quantized = w[indices].reshape(inputs.shape)
        e_latent_loss = jnp.mean((jax.lax.stop_gradient(quantized) - inputs) ** 2)
        vq_loss = self.commitment_cost * e_latent_loss
        quantized = inputs + jax.lax.stop_gradient(quantized - inputs)

        counts = jnp.bincount(indices, length=self.num_embeddings).astype(jnp.float32)
        avg_probs = counts / flat.shape[0]
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
        return vq_loss, quantized, perplexity, indices.reshape(inputs.shape[:-1])


class VQBottleneck(nn.Module):
    """Adapter making VectorQuantizerEMA usable as a TDNNF bottleneck_func;
    stores the auxiliary outputs in a mutable 'aux_loss' collection."""

    num_embeddings: int
    embedding_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        vq_loss, quantized, perplexity, _ = VectorQuantizerEMA(
            self.num_embeddings, self.embedding_dim, name="vq")(x, train=train)
        if not self.is_initializing():
            self.sow("aux_loss", "vq_loss", vq_loss)
            self.sow("aux_metric", "vq_perplexity", perplexity)
        return quantized


@jax.custom_vjp
def rev_grad(x: jnp.ndarray, alpha: float = 1.0):
    return x


def _rev_grad_fwd(x, alpha):
    return x, alpha


def _rev_grad_bwd(alpha, g):
    return (-g * alpha, None)


rev_grad.defvjp(_rev_grad_fwd, _rev_grad_bwd)
