#!/usr/bin/env python
"""Prototype race: gather strategies for the fused SA kernel (round 2).

The SA tail gathers pre[B,N,C] rows at idx[B,S,K] and feeds a shared
MLP + max.  The XLA path round-trips [B,S,K,C] through HBM (~4 ms of the
11 ms forward).  This script races the candidate in-kernel gather
mechanisms on the real TPU to pick the fused-kernel design:

  A. XLA flat gather (current index_points)          — baseline
  B. XLA one-hot matmul (index_points_onehot)
  C. Pallas: jnp.take along sublanes inside kernel   — legality probe
  D. Pallas: take_along_axis along lanes (pre_T)     — legality probe
  E. Pallas: per-k one-hot matmul from idx compare

Not part of the test suite; a design probe (results recorded in
BASELINE.md roofline notes).
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

from mm3d_tpu.ops import geometry as G
from mm3d_tpu.utils.profiling import chain_time

B, N, S, K, C = 64, 1024, 512, 32, 64
DT = jnp.bfloat16


def make_inputs(seed=0):
    r = np.random.RandomState(seed)
    pre = jnp.asarray(r.randn(B, N, C).astype(np.float32)).astype(DT)
    idx = jnp.asarray(r.randint(0, N, (B, S, K)).astype(np.int32))
    return pre, idx


# ---------------------------------------------------------- C: jnp.take
def _take_sublane_kernel(pre_ref, idx_ref, out_ref):
    idx = idx_ref[:].reshape(-1)  # [S*K]
    out_ref[:] = jnp.take(pre_ref[:], idx, axis=0)


def gather_take_sublane(pre, idx):
    return pl.pallas_call(
        _take_sublane_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, K), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, S * K, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S * K, C), pre.dtype),
    )(pre, idx)


# --------------------------------------------- D: take_along_axis lanes
def _take_lane_kernel(pre_t_ref, idx_ref, out_ref):
    idx = idx_ref[:].reshape(1, S * K)
    idx = jnp.broadcast_to(idx, (C, S * K))
    out_ref[:] = jnp.take_along_axis(pre_t_ref[:], idx, axis=1)


def gather_take_lane(pre, idx):
    pre_t = jnp.swapaxes(pre, 1, 2)  # [B, C, N]
    out = pl.pallas_call(
        _take_lane_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, C, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, K), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, C, S * K), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, S * K), pre.dtype),
    )(pre_t, idx)
    return jnp.swapaxes(out, 1, 2).reshape(B, S * K, C)


# --------------------------------------------- E: per-k one-hot matmul
def _onehot_kernel(st, pre_ref, idx_ref, out_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (st, N), 1)
    pre = pre_ref[:]
    for k in range(K):
        oh = (lane == idx_ref[:, k][:, None]).astype(pre.dtype)
        out_ref[:, k, :] = jnp.dot(oh, pre,
                                   preferred_element_type=jnp.float32
                                   ).astype(pre.dtype)


def gather_onehot_pallas(pre, idx, st=128):
    return pl.pallas_call(
        functools.partial(_onehot_kernel, st),
        grid=(B, S // st),
        in_specs=[
            pl.BlockSpec((None, N, C), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, st, K), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, st, K, C), lambda b, s: (b, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, K, C), pre.dtype),
    )(pre, idx).reshape(B, S * K, C)


def main():
    pre, idx = make_inputs()
    ref = np.asarray(G.index_points(pre, idx).reshape(B, S * K, C),
                     np.float32)

    def check(name, fn):
        try:
            out = np.asarray(jax.jit(fn)(pre, idx), np.float32)
        except Exception as e:
            msg = str(e).splitlines()[0][:140]
            print(f"{name:24s} FAILED: {msg}", flush=True)
            return None
        ok = np.array_equal(out, ref)
        sec = chain_time(lambda p: fn(p, idx).astype(jnp.float32)[:, ::8, :],
                         pre)
        print(f"{name:24s} exact={ok}  {sec*1e3:7.3f} ms", flush=True)
        return sec

    check("A xla flat gather", lambda p, i: G.index_points(p, i)
          .reshape(B, S * K, C))
    check("B xla one-hot matmul", lambda p, i: G.index_points_onehot(p, i)
          .reshape(B, S * K, C))
    check("C pallas take sublane", gather_take_sublane)
    check("D pallas take lane", gather_take_lane)
    check("E pallas per-k onehot", gather_onehot_pallas)


if __name__ == "__main__":
    main()
