#!/usr/bin/env python
"""Stage ablation of the fused SA kernel at the SA1 bench shape: measure
each pipeline stage's true cost by disabling stages one at a time (all
variants keep their inputs live so nothing dead-code-eliminates).

Variants (cumulative pipeline: d2 -> rank -> repeat -> onehot-compare ->
gather-matmul -> mlp -> max):
  full        everything (the v4 kernel's math)
  no_mlp      skip the 2 MLP matmuls + epilogues
  no_gather   skip the gather matmul (g := slice of oh)
  no_compare  oh := repeat(in_ball) (skip rank compare, keep repeat+dot)
  no_repeat   oh := iota pattern [R,NP] (skip repeat+compare, keep dot)
  no_rank     rank := d2 (skip the tri matmul)
  d2_only     just distances + reduce
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mm3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mm3d_tpu import ops
from mm3d_tpu.utils.profiling import chain_time

B, N, S, K, RADIUS = 64, 1024, 512, 32, 0.2
C1, C2, C3 = 64, 64, 128
P = 2
NP = N // P


def kernel(stage, new_ref, xyzt_ref, tri_ref, pre_ref, cb_ref, w1_ref,
           w2_ref, out_ref):
    St = new_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (St, N), 1)
    a = new_ref[:]
    b = xyzt_ref[:]
    cross = jnp.dot(a, b, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=0, keepdims=True)
    d2 = a2 - 2.0 * cross + b2
    in_ball = d2 <= RADIUS * RADIUS
    if stage == "d2_only":
        out_ref[:] = jnp.broadcast_to(
            jnp.sum(d2, axis=1, keepdims=True), out_ref.shape).astype(
                out_ref.dtype)
        return
    if stage == "no_rank":
        rank_f = d2
    else:
        rank_f = jnp.dot(in_ball.astype(jnp.int8), tri_ref[:],
                         preferred_element_type=jnp.int32).astype(
                             jnp.float32)
    rank_m = jnp.where(in_ball, rank_f, 0.0).astype(jnp.bfloat16)
    R = St * K
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    kv = row >> (St.bit_length() - 1)
    kv1 = (kv + 1).astype(jnp.bfloat16)
    if stage == "no_repeat":
        oh = (jax.lax.broadcasted_iota(jnp.int32, (R, NP), 1)
              == kv).astype(jnp.bfloat16)
        oh = oh * rank_m[0:1, 0:1]  # keep rank live (bf16 can't squeeze)
    elif stage == "no_compare":
        oh = (pltpu.repeat(rank_m[:, :NP], K, axis=0)
              + pltpu.repeat(rank_m[:, NP:], K, axis=0))
    else:
        oh = None
        for q in range(P):
            rq = pltpu.repeat(rank_m[:, q * NP:(q + 1) * NP], K, axis=0)
            ohq = jnp.maximum(1.0 - jnp.abs(rq - kv1), 0.0)
            oh = ohq if oh is None else oh + ohq
    if stage == "no_gather":
        g = oh[:, :C1].astype(jnp.float32)
    else:
        g2 = jnp.dot(oh, pre_ref[:], preferred_element_type=jnp.float32)
        g = g2[:, :C1] + g2[:, C1:2 * C1]  # cheap merge, keeps both halves
    cb_rep = pltpu.repeat(cb_ref[:], K, axis=0)
    h = jnp.maximum(g.astype(jnp.bfloat16) + cb_rep[:, :C1], 0.0)
    if stage != "no_mlp":
        h = jnp.maximum(
            jnp.dot(h, w1_ref[:C1, :],
                    preferred_element_type=jnp.float32).astype(
                        jnp.bfloat16), 0.0)
        h = jnp.maximum(
            jnp.dot(h, w2_ref[:],
                    preferred_element_type=jnp.float32).astype(
                        jnp.bfloat16), 0.0)
    else:
        h = jnp.pad(h, ((0, 0), (0, C3 - C1)))
    acc = h[0:St]
    for k in range(1, K):
        acc = jnp.maximum(acc, h[k * St:(k + 1) * St])
    out_ref[:] = acc.astype(out_ref.dtype)


def build(stage, st=64):
    r = np.random.RandomState(0)
    xyz = jnp.asarray(r.randn(B, N, 3).astype(np.float32))
    fidx = ops.farthest_point_sample(xyz, S)
    new_xyz = ops.index_points(xyz, fidx)
    xyz_t = jnp.pad(jnp.swapaxes(xyz, 1, 2), ((0, 0), (0, 5), (0, 0)))
    new_p = jnp.pad(new_xyz, ((0, 0), (0, 0), (0, 5)))
    tri = (jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
           ).astype(jnp.int8)
    pre = jnp.asarray(r.randn(B, NP, 128).astype(np.float32)).astype(
        jnp.bfloat16)
    cb = jnp.asarray(r.randn(B, S, 128).astype(np.float32)).astype(
        jnp.bfloat16)
    w1 = jnp.asarray((r.randn(128, C2) * .1).astype(np.float32)).astype(
        jnp.bfloat16)
    w2 = jnp.asarray(
        (r.randn(C2, C3) * .1).astype(np.float32)).astype(jnp.bfloat16)

    def f(pre_in):
        return pl.pallas_call(
            functools.partial(kernel, stage),
            grid=(B, S // st),
            in_specs=[
                pl.BlockSpec((None, st, 8), lambda bb, s: (bb, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 8, N), lambda bb, s: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, N), lambda bb, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, NP, 128), lambda bb, s: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, st, 128), lambda bb, s: (bb, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, C2), lambda bb, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C2, C3), lambda bb, s: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, st, C3), lambda bb, s: (bb, s, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, S, C3), jnp.bfloat16),
        )(new_p, xyz_t, tri, pre_in, cb, w1, w2)

    return f, pre


def main():
    stages = sys.argv[1:] or ["full", "no_mlp", "no_gather", "no_compare",
                              "no_repeat", "no_rank", "d2_only"]
    for stage in stages:
        f, pre = build(stage)

        def c(p):
            o = f(p)
            return p + (1e-6 * o.astype(jnp.float32).mean()).astype(p.dtype)

        ms = chain_time(c, pre, reps=3) * 1e3
        print(f"{stage:12s} {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
