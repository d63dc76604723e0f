"""Shared NN building blocks (Flax linen, channels-last).

The torch lineage expresses per-point shared MLPs as Conv1d/Conv2d with
1x1 kernels over ``[B, C, N]`` / ``[B, C, K, S]`` (SURVEY.md §2.3).  On
TPU a 1x1 conv IS a matmul over the channel axis, so here everything is
channels-last ``[B, ..., C]`` and a shared MLP is a stack of Dense layers
— the channel axis maps onto MXU lanes and XLA fuses BN+ReLU into the
matmul epilogue.

``BatchNorm`` is hand-rolled (not nn.BatchNorm) so that momentum is a
*call-time* argument: the lineage's training scripts anneal BN momentum
per epoch (momentum = 0.1 * 0.5^(epoch//20), torch convention
``running = (1-m)*running + m*batch``), which a static flax attribute
cannot express without recompiling module trees.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bn_train_apply(x, gamma, beta, eps):
    """Train-mode BN with a closed-form backward.

        d_x = gamma*inv * (d_y - mean(d_y) - xhat*mean(d_y*xhat))

    Measured on v5e this is throughput-NEUTRAL vs XLA's autodiff of the
    inline formula (42.2 ms train step either way): the grouped-BN
    fwd+bwd cost (~3 ms/layer at the SA2 shape) is the HBM bandwidth of
    the materialized [B,S,K,C] activations (268 MB f32 x ~6 passes),
    which XLA's autodiff already hits — a pass-count floor, not an
    inefficiency.  Kept for the explicit save-list contract (only
    (x, mean, inv) are residuals) and fewer HLO reductions.

    Returns (y, mean, var) — the stats feed the module's running-stat
    update, which is not differentiated (zero cotangent by contract).
    """
    y, mean, var, _ = _bn_train_fwd_parts(x, gamma, beta, eps)
    return y, mean, var


def _bn_train_fwd_parts(x, gamma, beta, eps):
    axes = tuple(range(x.ndim - 1))
    # statistics ALWAYS accumulate in f32: in bf16 mixed-precision
    # training the bf16-rounded mean/var poison the running stats and
    # eval-mode accuracy collapses (observed 43% -> 19.5% on the
    # 3-epoch synthetic check before this cast)
    xf = x.astype(jnp.float32)
    # shifted single-pass statistics: E[x²]-E[x]² cancels catastrophically
    # in f32 when |mean| >> std, so subtract a per-channel anchor (the
    # first element) first — still one pass over the data (the subtract
    # fuses into the reductions), but the sums stay O(std)-scaled
    # (ADVICE r2).  var is shift-invariant; mean adds the shift back.
    shift = jax.lax.stop_gradient(xf[(0,) * (x.ndim - 1)])
    xs = xf - shift
    mean_s = jnp.mean(xs, axes)
    var = jnp.maximum(jnp.mean(jnp.square(xs), axes) - jnp.square(mean_s),
                      0.0)
    mean = mean_s + shift
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) * gamma + beta
    return y, mean, var, inv


def _bn_train_apply_fwd(x, gamma, beta, eps):
    y, mean, var, inv = _bn_train_fwd_parts(x, gamma, beta, eps)
    return (y, mean, var), (x, gamma, mean, inv)


def _bn_train_apply_bwd(eps, res, cts):
    dy, _, _ = cts  # stats cotangents are zero (running-stat buffers)
    x, gamma, mean, inv = res
    axes = tuple(range(x.ndim - 1))
    T = 1
    for a in axes:
        T *= x.shape[a]
    dt = x.dtype
    xhat = (x - mean.astype(dt)) * inv.astype(dt)
    # reductions in f32 (see _bn_train_fwd_parts)
    m1 = jnp.mean(dy.astype(jnp.float32), axes)
    m2 = jnp.mean((dy * xhat).astype(jnp.float32), axes)
    d_x = ((gamma * inv.astype(dt))
           * (dy - m1.astype(dt) - xhat * m2.astype(dt)))
    d_gamma = m2 * T
    d_beta = m1 * T
    return d_x, d_gamma.astype(gamma.dtype), d_beta.astype(gamma.dtype)


_bn_train_apply.defvjp(_bn_train_apply_fwd, _bn_train_apply_bwd)


class BatchNorm(nn.Module):
    """BatchNorm over the last axis with call-time momentum.

    Torch semantics: eps 1e-5, momentum is the *new-batch* weight in the
    running-stat update.  Stats live in the 'batch_stats' collection.
    """

    use_running_average: Optional[bool] = None
    eps: float = 1e-5
    dtype: Optional[object] = None  # compute dtype (e.g. bf16 inference)

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None,
                 momentum: float = 0.1, fold: bool = False):
        ura = use_running_average
        if ura is None:
            ura = bool(self.use_running_average)
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features))
        if fold:
            # eval-mode BN is the affine map x*A + C; return (A, C) so the
            # caller can fold it into an adjacent matmul (fused SA kernel)
            inv = jax.lax.rsqrt(ra_var.value + self.eps)
            A = scale * inv
            C = bias - ra_mean.value * A
            if self.dtype is not None:
                A = A.astype(self.dtype)
                C = C.astype(self.dtype)
            return A, C
        if ura:
            mean, var = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(var + self.eps)
            if self.dtype is not None:
                x = x.astype(self.dtype)
                mean = mean.astype(self.dtype)
                inv = inv.astype(self.dtype)
                scale = scale.astype(self.dtype)
                bias = bias.astype(self.dtype)
            return (x - mean) * inv * scale + bias
        # train mode: single-pass E[x²]-E[x]² statistics and a
        # closed-form custom VJP (see _bn_train_apply) — both choices
        # are HBM-pass-count wins on the grouped [B,S,K,C] activations
        if self.dtype is not None:
            x = x.astype(self.dtype)
            scale = scale.astype(self.dtype)
            bias = bias.astype(self.dtype)
        y, mean, var = _bn_train_apply(x, scale, bias, self.eps)
        if not self.is_initializing():
            n = 1
            for a in range(x.ndim - 1):
                n *= x.shape[a]
            # torch tracks *unbiased* running variance
            unbiased = var * (n / max(n - 1, 1))
            mean32 = mean.astype(ra_mean.value.dtype)
            unb32 = unbiased.astype(ra_var.value.dtype)
            ra_mean.value = (1 - momentum) * ra_mean.value + momentum * mean32
            ra_var.value = (1 - momentum) * ra_var.value + momentum * unb32
        return y


class SharedMLP(nn.Module):
    """Dense+BN+ReLU stack applied pointwise over the last axis.

    Equivalent of the lineage's Conv2d(1x1)+BatchNorm2d+ReLU pyramids
    inside SA/FP blocks — on TPU each layer is one MXU matmul with the
    normalization fused into its epilogue.
    """

    features: Sequence[int]
    last_activation: bool = True
    dtype: Optional[object] = None  # compute dtype (e.g. bf16 inference)

    @nn.compact
    def __call__(self, x, train: bool = True, bn_momentum: float = 0.1,
                 fold: bool = False):
        if fold:
            # eval-mode folding: return [(W_i', b_i')] with BN absorbed,
            # so relu(x @ W' + b') == relu(BN(Dense(x))).  `x` is only a
            # shape/dtype proxy; no compute happens on it.
            folded = []
            c = x.shape[-1]
            for i, f in enumerate(self.features):
                d = nn.Dense(f, name=f"dense_{i}", dtype=self.dtype)
                d(jnp.zeros((1, c), x.dtype))  # bind (declare params)
                A, C = BatchNorm(name=f"bn_{i}", dtype=self.dtype)(
                    jnp.zeros((1, f), x.dtype), use_running_average=True,
                    fold=True)
                k = d.variables["params"]["kernel"]
                b = d.variables["params"]["bias"]
                if self.dtype is not None:
                    k = k.astype(self.dtype)
                    b = b.astype(self.dtype)
                folded.append((k * A[None, :], b * A + C))
                c = f
            return folded
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"dense_{i}", dtype=self.dtype)(x)
            x = BatchNorm(name=f"bn_{i}", dtype=self.dtype)(
                x, use_running_average=not train, momentum=bn_momentum)
            if self.last_activation or i + 1 < len(self.features):
                x = nn.relu(x)
        return x



def guarded_train_dtype(dtype, train: bool, guard: bool):
    """f32-numerics-island helper: None (f32 compute) while a bf16
    TRAIN guard is active, else `dtype` unchanged.  ONE definition for
    the measured guards in pointnet.py / pointnet2.py (the inline
    3-line expression had two drift-prone copies — code-review r5)."""
    if guard and train and dtype is not None \
            and jnp.dtype(dtype) == jnp.bfloat16:
        return None
    return dtype

def log_softmax_head(x):
    """The lineage returns log-probabilities from every model head."""
    return nn.log_softmax(x, axis=-1)


def max_pool_points(x, axis=-2):
    """Symmetric max aggregation over a point/neighbor axis."""
    return jnp.max(x, axis=axis)
