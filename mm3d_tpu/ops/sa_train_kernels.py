"""Training-mode fused SetAbstraction tail (VERDICT r1 item 3).

The eval-mode fused SA kernel folds BatchNorm into affine maps because
running stats are constants.  In training, each BN layer normalizes by
the CURRENT batch's statistics over the grouped [B,S,K,C] activation —
which is exactly the tensor fusion wants to keep out of HBM.  The
resolution: batch statistics are *reductions*, so they can be computed
by streaming passes that rebuild the grouped tile in VMEM from `idx`
(one compare + one MXU gather matmul) and emit only per-channel sums.

Forward = ball query (idx) + 3 stats passes (one per BN layer, each a
`[st*K, Np] one-hot @ pre` MXU gather + small MLP matmuls + per-channel
sum/sumsq) + 1 output pass with all BNs folded to affine maps.  The
[B,S,K,C] tensor never exists in HBM.

Backward is the exact BN-train VJP (gradients flow through the batch
statistics): the standard per-layer correction
    d_z = (gamma/sigma) * (d_y - mean(d_y) - zhat * mean(d_y*zhat))
needs global means of d_y and d_y*zhat per BN layer, and layer L's d_y
depends on layer L+1's corrections — an inherently sequential chain of
three reduction passes (R2 -> R1 -> R0), followed by one GRAD pass that
recomputes the chain a final time and emits d_pre (scatter as a
one-hot-transpose matmul), d_cb, dW1, dB1, dW2, dB2.

Every pass is O(S*K*C) MXU work with zero grouped-tensor HBM traffic.
fp32 operands cross the MXU as bf16 hi/lo splits (the 0/1 one-hot is
exact in bf16), keeping gradients within the 1e-3 parity gates.

Semantics match the unfused XLA path bit-for-bit in structure: `idx`
already carries the lineage's pad-by-first-hit/zero-hit-clamp rows, so
duplicate rows participate in statistics, max, and gradient exactly as
the materialized gather would.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mm3d_tpu.ops import dispatch


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# ------------------------------------------------------------ kernel body


def _split2(x):
    """f32 -> (hi, lo) bf16 pair; reconstruction error ~2^-16 relative."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _gather(oh, pre):
    """oh [R,Np] bf16 0/1 @ pre [Np,C]: exact one-hot side, 3-term bf16
    split of the f32 side (~2^-24 relative — the gathered rows feed BN
    folds whose gamma/sigma factors can amplify, so near-exactness here
    is what keeps whole-model activations at the 1e-4 level)."""
    if pre.dtype == jnp.float32:
        hi = pre.astype(jnp.bfloat16)
        r1 = pre - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        return (jnp.dot(oh, hi, preferred_element_type=jnp.float32)
                + jnp.dot(oh, mid, preferred_element_type=jnp.float32)
                + jnp.dot(oh, lo, preferred_element_type=jnp.float32))
    return jnp.dot(oh, pre, preferred_element_type=jnp.float32)


def _mm(a, b):
    """Small MLP matmul at full f32 fidelity."""
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


def _chain(oh, pre, cbr, w1, b1, w2, b2, depth):
    """Forward chain on folded operands: returns (y0, y1, y2) up to
    `depth` (later entries None).  y_l is the post-BN pre-relu value of
    layer l when the caller folds BN in; the RAW pre-BN value when the
    caller passes unfolded operands (stats passes)."""
    y0 = _gather(oh, pre) + cbr
    if depth == 0:
        return y0, None, None
    a1 = jnp.maximum(y0, 0.0)
    y1 = _mm(a1, w1) + b1
    if depth == 1:
        return y0, y1, None
    a2 = jnp.maximum(y1, 0.0)
    y2 = _mm(a2, w2) + b2
    return y0, y1, y2


def _row_valid(K: int, st: int, S: int, R: int):
    """[R,1] f32 mask: 1 for rows whose centroid index is < S (padded
    centroids must not contribute to statistics or gradients)."""
    s_in_tile = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) // K
    s_global = pl.program_id(1) * st + s_in_tile
    return (s_global < S).astype(jnp.float32)


def _oh_from_idx(idx_ref, Np, valid):
    idxv = idx_ref[:]  # [R, 1] i32
    lane = jax.lax.broadcasted_iota(jnp.int32, (R_shape(idx_ref), Np), 1)
    oh = (lane == idxv).astype(jnp.bfloat16)
    return oh * valid.astype(jnp.bfloat16)


def R_shape(ref):
    return ref.shape[0]


def _init_acc(*refs):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        for r in refs:
            r[:] = jnp.zeros_like(r)


# one kernel per pass; they share the helpers above.


def _stats_kernel(K, st, S, depth, idx_ref, pre_ref, cb_ref, w1_ref,
                  b1_ref, w2_ref, b2_ref, sum_ref, sumsq_ref):
    """Per-channel sum/sumsq of the depth-l pre-BN activation."""
    Np = pre_ref.shape[0]
    R = idx_ref.shape[0]
    valid = _row_valid(K, st, S, R)
    oh = _oh_from_idx(idx_ref, Np, valid)
    cbr = _rep_cb(cb_ref, K, R)
    y0, y1, y2 = _chain(oh, pre_ref[:], cbr, w1_ref[:], b1_ref[0:1, :],
                        w2_ref[:], b2_ref[0:1, :], depth)
    z = (y0, y1, y2)[depth]
    z = z * valid  # padded centroid rows excluded
    _init_acc(sum_ref, sumsq_ref)
    sum_ref[:] += jnp.sum(z, axis=0, keepdims=True)
    sumsq_ref[:] += jnp.sum(z * z, axis=0, keepdims=True)


def _rep_cb(cb_ref, K, R):
    st = cb_ref.shape[0]
    C = cb_ref.shape[1]
    return jnp.broadcast_to(cb_ref[:][:, None, :], (st, K, C)).reshape(R, C)


def _out_kernel(K, st, S, idx_ref, pre_ref, cb_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, out_ref):
    """Final forward: fully folded chain + relu + max over K."""
    Np = pre_ref.shape[0]
    R = idx_ref.shape[0]
    valid = _row_valid(K, st, S, R)
    oh = _oh_from_idx(idx_ref, Np, valid)
    cbr = _rep_cb(cb_ref, K, R)
    _, _, y2 = _chain(oh, pre_ref[:], cbr, w1_ref[:], b1_ref[0:1, :],
                      w2_ref[:], b2_ref[0:1, :], 2)
    a3 = jnp.maximum(y2, 0.0)
    out_ref[:] = jnp.max(a3.reshape(st, K, a3.shape[-1]), axis=1
                         ).astype(out_ref.dtype)


def _dy2(y2, out_ref, dout_ref, K, st):
    """Max-backward + relu-backward at the top of the chain.

    Even-split among exact ties (duplicate padded rows collapse to the
    same source point, so the convention does not affect d_pre)."""
    C = y2.shape[-1]
    a3 = jnp.maximum(y2, 0.0)
    o = out_ref[:]            # [st, C]
    o_rep = jnp.broadcast_to(o[:, None, :], (st, K, C)).reshape(-1, C)
    win = (a3 == o_rep).astype(jnp.float32)
    ties = jnp.sum(win.reshape(st, K, C), axis=1)  # [st, C] >= 1
    d = dout_ref[:] / jnp.maximum(ties, 1.0)
    d_rep = jnp.broadcast_to(d[:, None, :], (st, K, C)).reshape(-1, C)
    return d_rep * win * (y2 > 0)


def _r2_kernel(K, st, S, idx_ref, pre_ref, cb_ref, w1_ref, b1_ref,
               w2_ref, b2_ref, out_ref, dout_ref, gb2_ref,
               r2a_ref, r2b_ref):
    Np = pre_ref.shape[0]
    R = idx_ref.shape[0]
    valid = _row_valid(K, st, S, R)
    oh = _oh_from_idx(idx_ref, Np, valid)
    cbr = _rep_cb(cb_ref, K, R)
    _, _, y2 = _chain(oh, pre_ref[:], cbr, w1_ref[:], b1_ref[0:1, :],
                      w2_ref[:], b2_ref[0:1, :], 2)
    dy2 = _dy2(y2, out_ref, dout_ref, K, st) * valid
    z2hat = (y2 - gb2_ref[1:2, :]) / gb2_ref[0:1, :]
    _init_acc(r2a_ref, r2b_ref)
    r2a_ref[:] += jnp.sum(dy2, axis=0, keepdims=True)
    r2b_ref[:] += jnp.sum(dy2 * z2hat, axis=0, keepdims=True)


def _r1_kernel(K, st, S, idx_ref, pre_ref, cb_ref, w1_ref, b1_ref,
               w2_ref, b2_ref, out_ref, dout_ref, gb2_ref, m2_ref,
               a2row_ref, k2t_ref, gb1_ref, r1a_ref, r1b_ref):
    Np = pre_ref.shape[0]
    R = idx_ref.shape[0]
    valid = _row_valid(K, st, S, R)
    oh = _oh_from_idx(idx_ref, Np, valid)
    cbr = _rep_cb(cb_ref, K, R)
    _, y1, y2 = _chain(oh, pre_ref[:], cbr, w1_ref[:], b1_ref[0:1, :],
                       w2_ref[:], b2_ref[0:1, :], 2)
    dy2 = _dy2(y2, out_ref, dout_ref, K, st) * valid
    z2hat = (y2 - gb2_ref[1:2, :]) / gb2_ref[0:1, :]
    dz2 = a2row_ref[0:1, :] * (dy2 - m2_ref[0:1, :]
                               - z2hat * m2_ref[1:2, :]) * valid
    da2 = _mm(dz2, k2t_ref[:])
    dy1 = da2 * (y1 > 0)
    z1hat = (y1 - gb1_ref[1:2, :]) / gb1_ref[0:1, :]
    _init_acc(r1a_ref, r1b_ref)
    r1a_ref[:] += jnp.sum(dy1, axis=0, keepdims=True)
    r1b_ref[:] += jnp.sum(dy1 * z1hat, axis=0, keepdims=True)


def _r0_kernel(K, st, S, idx_ref, pre_ref, cb_ref, w1_ref, b1_ref,
               w2_ref, b2_ref, out_ref, dout_ref, gb2_ref, m2_ref,
               a2row_ref, k2t_ref, gb1_ref, m1_ref, a1row_ref, k1t_ref,
               gb0_ref, r0a_ref, r0b_ref):
    Np = pre_ref.shape[0]
    R = idx_ref.shape[0]
    valid = _row_valid(K, st, S, R)
    oh = _oh_from_idx(idx_ref, Np, valid)
    cbr = _rep_cb(cb_ref, K, R)
    y0, y1, y2 = _chain(oh, pre_ref[:], cbr, w1_ref[:], b1_ref[0:1, :],
                        w2_ref[:], b2_ref[0:1, :], 2)
    dy2 = _dy2(y2, out_ref, dout_ref, K, st) * valid
    z2hat = (y2 - gb2_ref[1:2, :]) / gb2_ref[0:1, :]
    dz2 = a2row_ref[0:1, :] * (dy2 - m2_ref[0:1, :]
                               - z2hat * m2_ref[1:2, :]) * valid
    dy1 = _mm(dz2, k2t_ref[:]) * (y1 > 0)
    z1hat = (y1 - gb1_ref[1:2, :]) / gb1_ref[0:1, :]
    dz1 = a1row_ref[0:1, :] * (dy1 - m1_ref[0:1, :]
                               - z1hat * m1_ref[1:2, :]) * valid
    dy0 = _mm(dz1, k1t_ref[:]) * (y0 > 0)
    z0hat = (y0 - gb0_ref[1:2, :]) / gb0_ref[0:1, :]
    _init_acc(r0a_ref, r0b_ref)
    r0a_ref[:] += jnp.sum(dy0, axis=0, keepdims=True)
    r0b_ref[:] += jnp.sum(dy0 * z0hat, axis=0, keepdims=True)


def _grad_kernel(K, st, S, idx_ref, pre_ref, cb_ref, w1_ref, b1_ref,
                 w2_ref, b2_ref, out_ref, dout_ref, gb2_ref, m2_ref,
                 a2row_ref, k2t_ref, gb1_ref, m1_ref, a1row_ref, k1t_ref,
                 gb0_ref, m0_ref, a0row_ref,
                 dpre_ref, dcb_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    """Final backward pass: all BN corrections known; emit everything."""
    Np = pre_ref.shape[0]
    R = idx_ref.shape[0]
    valid = _row_valid(K, st, S, R)
    oh = _oh_from_idx(idx_ref, Np, valid)
    cbr = _rep_cb(cb_ref, K, R)
    y0, y1, y2 = _chain(oh, pre_ref[:], cbr, w1_ref[:], b1_ref[0:1, :],
                        w2_ref[:], b2_ref[0:1, :], 2)
    a1 = jnp.maximum(y0, 0.0)
    a2 = jnp.maximum(y1, 0.0)
    dy2 = _dy2(y2, out_ref, dout_ref, K, st) * valid
    z2hat = (y2 - gb2_ref[1:2, :]) / gb2_ref[0:1, :]
    dz2 = a2row_ref[0:1, :] * (dy2 - m2_ref[0:1, :]
                               - z2hat * m2_ref[1:2, :]) * valid
    dy1 = _mm(dz2, k2t_ref[:]) * (y1 > 0)
    z1hat = (y1 - gb1_ref[1:2, :]) / gb1_ref[0:1, :]
    dz1 = a1row_ref[0:1, :] * (dy1 - m1_ref[0:1, :]
                               - z1hat * m1_ref[1:2, :]) * valid
    dy0 = _mm(dz1, k1t_ref[:]) * (y0 > 0)
    z0hat = (y0 - gb0_ref[1:2, :]) / gb0_ref[0:1, :]
    dh0 = a0row_ref[0:1, :] * (dy0 - m0_ref[0:1, :]
                               - z0hat * m0_ref[1:2, :]) * valid

    @pl.when(pl.program_id(1) == 0)
    def _():
        dpre_ref[:] = jnp.zeros_like(dpre_ref)

    _init_acc(dw1_ref, db1_ref, dw2_ref, db2_ref)

    # d_pre: one-hot-transpose scatter (hi/lo split of dh0, oh exact)
    hi, lo = _split2(dh0)
    ohT_dot = jax.lax.dot_general(
        oh, hi, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ohT_dot = ohT_dot + jax.lax.dot_general(
        oh, lo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dpre_ref[:] += ohT_dot
    dcb_ref[:] = jnp.sum(dh0.reshape(st, K, dh0.shape[-1]), axis=1)

    # dW = a^T @ dz (contract rows), dB = column sums
    def tdot(a, b):
        h2, l2 = _split2(a)
        hb, lb = _split2(b)
        return (jax.lax.dot_general(h2, hb, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(h2, lb, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
                + jax.lax.dot_general(l2, hb, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32))

    dw1_ref[:] += tdot(a1, dz1)
    db1_ref[:] += jnp.sum(dz1, axis=0, keepdims=True)
    dw2_ref[:] += tdot(a2, dz2)
    db2_ref[:] += jnp.sum(dz2, axis=0, keepdims=True)


# ------------------------------------------------------------- wrappers


def _pad_params(w1, b1, w2, b2, C1p, C2p, C3p, f=jnp.float32):
    C1, C2 = w1.shape
    C3 = w2.shape[1]
    w1p = jnp.pad(w1.astype(f), ((0, C1p - C1), (0, C2p - C2)))
    w2p = jnp.pad(w2.astype(f), ((0, C2p - C2), (0, C3p - C3)))
    b1p = jnp.broadcast_to(jnp.pad(b1.astype(f), (0, C2p - C2)), (8, C2p))
    b2p = jnp.broadcast_to(jnp.pad(b2.astype(f), (0, C3p - C3)), (8, C3p))
    return w1p, b1p, w2p, b2p


def _row8(v, Cp, pad_value=0.0):
    return jnp.broadcast_to(
        jnp.pad(v.astype(jnp.float32), (0, Cp - v.shape[0]),
                constant_values=pad_value), (8, Cp))


def _rows2(a, b, Cp, pa=0.0, pb=0.0):
    """[8, Cp] with row0 = a, row1 = b (m / gamma-beta packs)."""
    r = jnp.zeros((8, Cp), jnp.float32)
    r = r.at[0, :].set(jnp.pad(a.astype(jnp.float32),
                               (0, Cp - a.shape[0]), constant_values=pa))
    r = r.at[1, :].set(jnp.pad(b.astype(jnp.float32),
                               (0, Cp - b.shape[0]), constant_values=pb))
    return r


class _Plan:
    """Shared padding/tiling plan for all passes of one SA-tail call."""

    def __init__(self, B, N, S, K, C1, C2, C3, interpret):
        self.B, self.N, self.S, self.K = B, N, S, K
        self.C1, self.C2, self.C3 = C1, C2, C3
        self.Np = _round_up(N, 128)
        self.Sp = _round_up(S, 8)
        self.C1p = _round_up(C1, 128)
        self.C2p = _round_up(C2, 128)
        self.C3p = _round_up(C3, 128)
        # per-R-row VMEM footprint: one-hot (bf16) + idx tile (i32 lane-
        # padded to 128) + f32 chain intermediates (y0/a1 ~3x C1p,
        # y1/a2 ~2x C2p, y2/dz ~2x C3p); budget ~6 MB of the 16 MB
        # scoped limit leaves room for pre/tri/params and double buffers
        per_row = (2 * self.Np + 512 + 12 * self.C1p
                   + 8 * self.C2p + 8 * self.C3p)
        budget = 6 * 1024 * 1024
        self.interpret = (not _on_tpu()) if interpret is None else interpret
        if self.interpret:
            # no VMEM limit in the interpreter, and each grid step is a
            # Python-level loop iteration — one full-size tile makes the
            # CPU test suite several times faster
            st = self.Sp
        else:
            st = min(self.Sp, max(8, (budget // per_row) // K))
            while self.Sp % st:
                st -= 1
        self.st = st
        self.R = st * K
        self.grid = (B, self.Sp // st)

    # block spec helpers
    def b_idx(self):
        return pl.BlockSpec((None, self.R, 1),
                            lambda b, s: (b, s, 0),
                            memory_space=pltpu.VMEM)

    def b_pre(self):
        return pl.BlockSpec((None, self.Np, self.C1p),
                            lambda b, s: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def b_cb(self):
        return pl.BlockSpec((None, self.st, self.C1p),
                            lambda b, s: (b, s, 0),
                            memory_space=pltpu.VMEM)

    def b_mat(self, r, c):
        return pl.BlockSpec((r, c), lambda b, s: (0, 0),
                            memory_space=pltpu.VMEM)

    def b_out(self, c):
        return pl.BlockSpec((None, self.st, c), lambda b, s: (b, s, 0),
                            memory_space=pltpu.VMEM)

    def prep_idx(self, idx):
        # [B,S,K] -> [B, Sp*K, 1] so rows land on sublanes
        idxp = jnp.pad(idx.astype(jnp.int32),
                       ((0, 0), (0, self.Sp - self.S), (0, 0)))
        return idxp.reshape(self.B, self.Sp * self.K, 1)

    def prep_pre(self, pre):
        return jnp.pad(pre.astype(jnp.float32),
                       ((0, 0), (0, self.Np - self.N),
                        (0, self.C1p - self.C1)))

    def prep_cb(self, cb):
        return jnp.pad(cb.astype(jnp.float32),
                       ((0, 0), (0, self.Sp - self.S),
                        (0, self.C1p - self.C1)))


def sa_train_stats(plan, depth, idx_p, pre_p, cb_p, w1p, b1p, w2p, b2p):
    """One stats pass -> (sum, sumsq) [C] f32 (unpadded)."""
    Cp = (plan.C1p, plan.C2p, plan.C3p)[depth]
    C = (plan.C1, plan.C2, plan.C3)[depth]
    kern = functools.partial(_stats_kernel, plan.K, plan.st, plan.S, depth)
    s, ss = pl.pallas_call(
        kern,
        grid=plan.grid,
        in_specs=[plan.b_idx(), plan.b_pre(), plan.b_cb(),
                  plan.b_mat(plan.C1p, plan.C2p), plan.b_mat(8, plan.C2p),
                  plan.b_mat(plan.C2p, plan.C3p), plan.b_mat(8, plan.C3p)],
        out_specs=[pl.BlockSpec((1, Cp), lambda b, s: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, Cp), lambda b, s: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, Cp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Cp), jnp.float32)],
        interpret=plan.interpret,
    )(idx_p, pre_p, cb_p, w1p, b1p, w2p, b2p)
    return s[0, :C], ss[0, :C]


def sa_train_out(plan, idx_p, pre_p, cb_p, w1p, b1p, w2p, b2p):
    out = pl.pallas_call(
        functools.partial(_out_kernel, plan.K, plan.st, plan.S),
        grid=plan.grid,
        in_specs=[plan.b_idx(), plan.b_pre(), plan.b_cb(),
                  plan.b_mat(plan.C1p, plan.C2p), plan.b_mat(8, plan.C2p),
                  plan.b_mat(plan.C2p, plan.C3p), plan.b_mat(8, plan.C3p)],
        out_specs=plan.b_out(plan.C3p),
        out_shape=jax.ShapeDtypeStruct((plan.B, plan.Sp, plan.C3p),
                                       jnp.float32),
        interpret=plan.interpret,
    )(idx_p, pre_p, cb_p, w1p, b1p, w2p, b2p)
    return out[:, :plan.S, :plan.C3]


def _reduction_call(plan, kern, extra_inputs, extra_specs, out_cp):
    ra, rb = pl.pallas_call(
        kern,
        grid=plan.grid,
        in_specs=[plan.b_idx(), plan.b_pre(), plan.b_cb(),
                  plan.b_mat(plan.C1p, plan.C2p), plan.b_mat(8, plan.C2p),
                  plan.b_mat(plan.C2p, plan.C3p), plan.b_mat(8, plan.C3p),
                  plan.b_out(plan.C3p), plan.b_out(plan.C3p)] + extra_specs,
        out_specs=[pl.BlockSpec((1, out_cp), lambda b, s: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, out_cp), lambda b, s: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, out_cp), jnp.float32),
                   jax.ShapeDtypeStruct((1, out_cp), jnp.float32)],
        interpret=plan.interpret,
    )(*extra_inputs)
    return ra, rb


# ------------------------------------------------------- public function


def fused_sa_train(radius, nsample, xyz, new_xyz, pre, cb,
                   k1, b1d, k2, b2d, g0, be0, g1, be1, g2, be2,
                   eps: float = 1e-5, interpret: Optional[bool] = None):
    """Train-mode SA tail with exact BN-train gradients.

    Returns (out [B,S,C3] f32, (mean,var) per BN layer).  Differentiable
    wrt pre, cb, k1, b1d, k2, b2d and the 3 (gamma, beta) pairs; the
    stats outputs carry zero cotangent (they only feed running-stat
    buffer updates, which the lineage does not differentiate).

    Cited behavior: torch lineage SA block conv-bn-relu pyramids +
    max over neighbors (SURVEY.md §2.3); BN train semantics as in
    models/layers.BatchNorm.
    """
    idx = _ball_query(radius, nsample, xyz, new_xyz)
    return _sa_train_cv(idx, pre, cb, k1, b1d, k2, b2d,
                        g0, be0, g1, be1, g2, be2,
                        _Static(eps, interpret))


class _Static:
    """Hashable aux config (static argument of the custom_vjp)."""

    def __init__(self, eps, interpret):
        self.eps = eps
        self.interpret = interpret

    def __hash__(self):
        return hash((self.eps, self.interpret))

    def __eq__(self, o):
        return (self.eps, self.interpret) == (o.eps, o.interpret)


def _ball_query(radius, nsample, xyz, new_xyz):
    from mm3d_tpu.ops import geometry as G
    return G.query_ball_point(radius, nsample, xyz, new_xyz)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13,))
def _sa_train_cv(idx, pre, cb, k1, b1d, k2, b2d,
                 g0, be0, g1, be1, g2, be2, static):
    out, stats, _ = _sa_train_fwd_impl(idx, pre, cb, k1, b1d, k2, b2d,
                                       g0, be0, g1, be1, g2, be2, static)
    return out, stats


def _fold(gamma, beta, mean, var, eps):
    A = gamma * jax.lax.rsqrt(var + eps)
    C = beta - mean * A
    return A, C


def _sa_train_fwd_impl(idx, pre, cb, k1, b1d, k2, b2d,
                       g0, be0, g1, be1, g2, be2, static):
    B, N, C1 = pre.shape
    S = cb.shape[1]
    K = idx.shape[-1]
    C2, C3 = k1.shape[1], k2.shape[1]
    plan = _Plan(B, N, S, K, C1, C2, C3, static.interpret)
    T = B * S * K
    eps = static.eps

    idx_p = plan.prep_idx(idx)
    pre_p = plan.prep_pre(pre)
    cb_p = plan.prep_cb(cb)
    w1p, b1p, w2p, b2p = _pad_params(k1, b1d, k2, b2d,
                                     plan.C1p, plan.C2p, plan.C3p)

    # --- BN0 stats over h0 = gather(pre) + cb (raw operands)
    s0, ss0 = sa_train_stats(plan, 0, idx_p, pre_p, cb_p,
                             w1p, b1p, w2p, b2p)
    m0 = s0 / T
    v0 = jnp.maximum(ss0 / T - m0 * m0, 0.0)
    A0, Cc0 = _fold(g0, be0, m0, v0, eps)

    # --- BN1 stats over z1 = relu(y0) @ k1 + b1d (fold BN0 in)
    preA = plan.prep_pre(pre * A0)
    cbA = plan.prep_cb(cb * A0 + Cc0)
    s1, ss1 = sa_train_stats(plan, 1, idx_p, preA, cbA,
                             w1p, b1p, w2p, b2p)
    m1 = s1 / T
    v1 = jnp.maximum(ss1 / T - m1 * m1, 0.0)
    A1, Cc1 = _fold(g1, be1, m1, v1, eps)

    # --- BN2 stats over z2 (fold BN0 + BN1 in)
    w1f, b1f, w2f, b2f = _pad_params(k1 * A1[None, :], b1d * A1 + Cc1,
                                     k2, b2d, plan.C1p, plan.C2p, plan.C3p)
    s2, ss2 = sa_train_stats(plan, 2, idx_p, preA, cbA,
                             w1f, b1f, w2p, b2p)
    m2 = s2 / T
    v2 = jnp.maximum(ss2 / T - m2 * m2, 0.0)
    A2, Cc2 = _fold(g2, be2, m2, v2, eps)

    # --- fully folded forward
    _, _, w2ff, b2ff = _pad_params(k1, b1d, k2 * A2[None, :],
                                   b2d * A2 + Cc2,
                                   plan.C1p, plan.C2p, plan.C3p)
    out = sa_train_out(plan, idx_p, preA, cbA, w1f, b1f, w2ff, b2ff)

    folded = (preA, cbA, w1f, b1f, w2ff, b2ff)
    stats = ((m0, v0), (m1, v1), (m2, v2))
    aux = (plan, folded, (A0, A1, A2), stats, idx_p, out)
    return out, stats, aux


def _sa_train_cv_fwd(idx, pre, cb, k1, b1d, k2, b2d,
                     g0, be0, g1, be1, g2, be2, static):
    out, stats, aux = _sa_train_fwd_impl(idx, pre, cb, k1, b1d, k2, b2d,
                                         g0, be0, g1, be1, g2, be2,
                                         static)
    plan, folded, As, _, idx_p, _ = aux
    res = (idx_p, idx.shape, folded, As, stats, out,
           (pre, cb, k1, b1d, k2, b2d, g0, be0, g1, be1, g2, be2))
    return (out, stats), res


def _sa_train_cv_bwd(static, res, cts):
    dout, _ = cts  # stats cotangents are zero by contract
    idx_p, idx_shape, folded, (A0, A1, A2), stats, out, prims = res
    (pre, cb, k1, b1d, k2, b2d, g0, be0, g1, be1, g2, be2) = prims
    (m0, v0), (m1, v1), (m2, v2) = stats
    B, N, C1 = pre.shape
    S = cb.shape[1]
    K = idx_shape[-1]
    C2, C3 = k1.shape[1], k2.shape[1]
    plan = _Plan(B, N, S, K, C1, C2, C3, static.interpret)
    T = B * S * K
    eps = static.eps
    preA, cbA, w1f, b1f, w2ff, b2ff = folded

    out_p = jnp.pad(out.astype(jnp.float32),
                    ((0, 0), (0, plan.Sp - S), (0, plan.C3p - C3)))
    dout_p = jnp.pad(dout.astype(jnp.float32),
                     ((0, 0), (0, plan.Sp - S), (0, plan.C3p - C3)))

    gb2 = _rows2(g2, be2, plan.C3p, pa=1.0)   # row0 gamma (pad 1), row1 beta
    gb1 = _rows2(g1, be1, plan.C2p, pa=1.0)
    gb0 = _rows2(g0, be0, plan.C1p, pa=1.0)
    A2row = _row8(A2, plan.C3p)
    A1row = _row8(A1, plan.C2p)
    A0row = _row8(A0, plan.C1p)
    k2t = jnp.pad(k2.astype(jnp.float32).T,
                  ((0, plan.C3p - C3), (0, plan.C2p - C2)))
    k1t = jnp.pad(k1.astype(jnp.float32).T,
                  ((0, plan.C2p - C2), (0, plan.C1p - C1)))

    base_in = [idx_p, preA, cbA, w1f, b1f, w2ff, b2ff, out_p, dout_p]

    # R2: BN2 reduction
    r2a, r2b = _reduction_call(
        plan, functools.partial(_r2_kernel, plan.K, plan.st, plan.S),
        base_in + [gb2],
        [plan.b_mat(8, plan.C3p)], plan.C3p)
    m2a = r2a / T
    m2b = r2b / T

    # R1: BN1 reduction
    r1a, r1b = _reduction_call(
        plan, functools.partial(_r1_kernel, plan.K, plan.st, plan.S),
        base_in + [gb2, _rows2(m2a[0], m2b[0], plan.C3p), A2row, k2t, gb1],
        [plan.b_mat(8, plan.C3p), plan.b_mat(8, plan.C3p),
         plan.b_mat(8, plan.C3p), plan.b_mat(plan.C3p, plan.C2p),
         plan.b_mat(8, plan.C2p)], plan.C2p)
    m1a = r1a / T
    m1b = r1b / T

    # R0: BN0 reduction
    r0a, r0b = _reduction_call(
        plan, functools.partial(_r0_kernel, plan.K, plan.st, plan.S),
        base_in + [gb2, _rows2(m2a[0], m2b[0], plan.C3p), A2row, k2t, gb1,
                   _rows2(m1a[0], m1b[0], plan.C2p), A1row, k1t, gb0],
        [plan.b_mat(8, plan.C3p), plan.b_mat(8, plan.C3p),
         plan.b_mat(8, plan.C3p), plan.b_mat(plan.C3p, plan.C2p),
         plan.b_mat(8, plan.C2p), plan.b_mat(8, plan.C2p),
         plan.b_mat(8, plan.C2p), plan.b_mat(plan.C2p, plan.C1p),
         plan.b_mat(8, plan.C1p)], plan.C1p)
    m0a = r0a / T
    m0b = r0b / T

    # GRAD: emit d_pre, d_cb, dW1, dB1, dW2, dB2
    dpre, dcb, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_grad_kernel, plan.K, plan.st, plan.S),
        grid=plan.grid,
        in_specs=[plan.b_idx(), plan.b_pre(), plan.b_cb(),
                  plan.b_mat(plan.C1p, plan.C2p), plan.b_mat(8, plan.C2p),
                  plan.b_mat(plan.C2p, plan.C3p), plan.b_mat(8, plan.C3p),
                  plan.b_out(plan.C3p), plan.b_out(plan.C3p),
                  plan.b_mat(8, plan.C3p), plan.b_mat(8, plan.C3p),
                  plan.b_mat(8, plan.C3p), plan.b_mat(plan.C3p, plan.C2p),
                  plan.b_mat(8, plan.C2p), plan.b_mat(8, plan.C2p),
                  plan.b_mat(8, plan.C2p), plan.b_mat(plan.C2p, plan.C1p),
                  plan.b_mat(8, plan.C1p), plan.b_mat(8, plan.C1p),
                  plan.b_mat(8, plan.C1p)],
        out_specs=[
            pl.BlockSpec((None, plan.Np, plan.C1p), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            plan.b_out(plan.C1p),
            pl.BlockSpec((plan.C1p, plan.C2p), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, plan.C2p), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.C2p, plan.C3p), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, plan.C3p), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, plan.Np, plan.C1p), jnp.float32),
            jax.ShapeDtypeStruct((B, plan.Sp, plan.C1p), jnp.float32),
            jax.ShapeDtypeStruct((plan.C1p, plan.C2p), jnp.float32),
            jax.ShapeDtypeStruct((1, plan.C2p), jnp.float32),
            jax.ShapeDtypeStruct((plan.C2p, plan.C3p), jnp.float32),
            jax.ShapeDtypeStruct((1, plan.C3p), jnp.float32),
        ],
        interpret=plan.interpret,
    )(*(base_in + [gb2, _rows2(m2a[0], m2b[0], plan.C3p), A2row, k2t, gb1,
                   _rows2(m1a[0], m1b[0], plan.C2p), A1row, k1t, gb0,
                   _rows2(m0a[0], m0b[0], plan.C1p), A0row]))

    # NOTE: the folded operands mean dz/dy computed in kernels are wrt
    # the *normalized* chain; translate back to primal params:
    # d_pre carries A0 from (pre * A0): the kernel computed d wrt preA,
    # but we fed dh0 already multiplied by A0 (the BN0 chain rule), and
    # pre enters h0 linearly through the gather of *pre* (not preA) in
    # the primal graph — so d_pre = scatter(dh0) exactly as emitted.
    d_pre = dpre[:, :N, :C1].astype(pre.dtype)
    d_cb = dcb[:, :S, :C1].astype(cb.dtype)
    # d_gamma = sum(d_y * zhat) and d_beta = sum(d_y) — the reduction
    # passes already computed exactly these sums
    d_g0 = r0b[0, :C1]
    d_be0 = r0a[0, :C1]
    d_g1 = r1b[0, :C2]
    d_be1 = r1a[0, :C2]
    d_g2 = r2b[0, :C3]
    d_be2 = r2a[0, :C3]
    d_k1 = dw1[:C1, :C2].astype(k1.dtype)
    d_b1d = db1[0, :C2].astype(b1d.dtype)
    d_k2 = dw2[:C2, :C3].astype(k2.dtype)
    d_b2d = db2[0, :C3].astype(b2d.dtype)
    d_idx = np.zeros(idx_shape, jax.dtypes.float0)
    return (d_idx, d_pre, d_cb, d_k1, d_b1d, d_k2, d_b2d,
            d_g0.astype(g0.dtype), d_be0.astype(be0.dtype),
            d_g1.astype(g1.dtype), d_be1.astype(be1.dtype),
            d_g2.astype(g2.dtype), d_be2.astype(be2.dtype))


_sa_train_cv.defvjp(_sa_train_cv_fwd, _sa_train_cv_bwd)

dispatch.register_kernel("fused_sa_train", fused_sa_train)
