"""PointNet++ model family (Flax, channels-last).

Set-abstraction (SSG + MSG) and feature-propagation blocks composed from
the L0 geometry ops, plus the canonical classification / part-seg /
sem-seg architectures (SURVEY.md §2.3, §3.3; hyperparameters are the
canonical lineage configs — npoint/radius/nsample/mlp pyramids).

TPU design notes (BASELINE.json:5):
* channels-last everywhere — each shared-MLP layer is one MXU matmul and
  XLA fuses the grouping gather, recentering, BN and ReLU around it, so
  an SA block compiles to a single fused stage;
* all shapes static (npoint/nsample fixed per config) — nothing
  recompiles across steps;
* the hot ops (FPS etc.) dispatch to Pallas kernels on TPU.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm3d_tpu import ops
from mm3d_tpu.ops import dispatch
from mm3d_tpu.models.layers import guarded_train_dtype, BatchNorm, SharedMLP, log_softmax_head


def _dbg_dtype(component: str, dtype):
    """bf16 numerics bisection knob (debug only): MM3D_BF16_DEBUG is a
    comma list of components forced back to f32 (e.g. "sa" or "head").
    Unset in production — returns dtype unchanged."""
    import os
    dbg = os.environ.get("MM3D_BF16_DEBUG", "")
    return None if dbg and component in dbg.split(",") else dtype


def _want_fused_sa(train: bool, mlp, dtype) -> bool:
    """Take the fused SA Pallas kernel (eval only, 3-layer MLP shape)?

    In bf16 serving mode the fused kernel is a large win (no [B,S,K,C]
    HBM round trip).  In strict-fp32 mode its matmuls must run at
    HIGHEST precision, which costs more than the round trip saves — so
    fp32 keeps the unfused XLA path unless the mode is explicitly
    'pallas' (tests / forced kernels).
    """
    if train or len(mlp) != 3:
        return False
    if dtype is not None and jnp.dtype(dtype) == jnp.bfloat16:
        return True
    return dispatch.get_impl() == "pallas"


def _want_fused_sa_idx(train: bool, mlp, dtype, knn: bool,
                       nsample: int, n_points: int) -> bool:
    """Route the given-idx fused SA tail (kNN serving, fused_sa_idx)?

    Gates: eval-mode 3-layer kNN block with K <= 128 (the kernel's
    one-hot build clamps slot ranks to 128 lanes).  Beyond that, the r5
    on-chip race (log/r5_knn_race.log) showed the kernel trades the
    K-element gather for an R*N*C1 one-hot matmul, so it wins only
    where N/nsample is small — SA2 (N/K=8, bf16) wins 1.66x while SA1
    (N/K=32) loses in both dtypes.  Auto mode therefore takes it below
    N/K <= 16 (the geometric midpoint of the raced shapes); explicit
    'pallas' mode always routes (tests/sweeps exercise every shape).
    """
    if not (_want_fused_sa(train, mlp, dtype) and knn and nsample <= 128):
        return False
    if dispatch.get_impl() == "pallas":
        return True
    return n_points <= 16 * nsample


def _want_fused_fp(train: bool) -> bool:
    """Take the fused FP-tail Pallas kernel (eval only)?

    Raced on v5e at the semseg/partseg FP shapes (scripts/
    proto_fp_fused.py, r3): bf16 2.9-14x and fp32 1.8-6.4x the op
    composition, parity 0 / 2.2e-7 rel — so eval takes it in EVERY
    serving dtype, unlike _want_fused_sa whose fp32-auto path stays
    unfused (dispatch still confines it to TPU-auto or explicit
    'pallas'; the training path keeps the composition, whose
    scatter-add backward already routes through the Pallas gather
    backward).
    """
    return not train


def _fps_start(module: nn.Module, train: bool, xyz: jax.Array):
    """Lineage-parity random-start FPS seed.

    The torch lineage seeds farthest_point_sample with a fresh randint
    per call during TRAINING (grouping-seed variation acts as a mild
    regularizer); eval is deterministic.  Enabled by passing an "fps"
    RNG stream to apply (train.py --fps_random_start); absent stream ->
    start index 0, bit-identical to the previous behavior.
    """
    if train and module.has_rng("fps"):
        return jax.random.randint(module.make_rng("fps"),
                                  (xyz.shape[0],), 0, xyz.shape[1])
    return 0


class SetAbstraction(nn.Module):
    """Single-scale grouping SA block: sample_and_group -> MLP -> max.

    TPU optimization (`project_first`, on by default): the grouping
    gather is linear, so the first shared-MLP layer commutes with it:

        [g_xyz - c, g_feats] @ W0 + b0
            = gather(concat[xyz, feats] @ W0) - c @ W0[:3] + b0

    Projecting the N input points once and gathering C1-wide rows is
    much faster on TPU than gathering 3-wide rows (lane utilization) and
    replaces the S*K-row layer-0 matmul with an N-row one.  Numerically
    identical up to fp32 reassociation.
    """

    npoint: Optional[int] = None  # None with group_all=True
    radius: Optional[float] = None
    nsample: Optional[int] = None
    mlp: Sequence[int] = ()
    group_all: bool = False
    project_first: bool = True
    knn: bool = False  # kNN grouping instead of ball query
    dtype: Optional[object] = None  # compute dtype for the MLP stack
    # Force THIS block to f32 during bf16 TRAINING (serving stays bf16).
    # Set by models whose first SA consumes raw mixed-scale features
    # (semseg 9-dim block features carry room-scale absolute coords):
    # even with f32 recentering, casting the recentered-geometry +
    # large-feature sum to bf16 drowns the local signal in rounding of
    # the large terms.  Measured (r3 bisection, 15-ep semseg pair):
    # full-bf16 mIoU 0.47 vs fp32 0.65; sa1-f32 alone restores 0.73.
    f32_train_guard: bool = False

    @nn.compact
    def __call__(self, xyz, feats, train: bool = True,
                 bn_momentum: float = 0.1):
        # xyz [B,N,3], feats [B,N,D] or None
        dt = guarded_train_dtype(self.dtype, train, self.f32_train_guard)
        if self.group_all or not self.project_first:
            mdt = self.dtype
            if (self.group_all and train and mdt is not None
                    and jnp.dtype(mdt) == jnp.bfloat16):
                # measured numerics guard (r3 bisection): with the whole
                # net in bf16, training plateaus at ~50-65% where fp32
                # reaches 99% (3 seeds, 12-30 epochs); forcing ONLY this
                # global-feature group_all stack back to f32 restores
                # full convergence (98.4/100/99.2% across seeds; the
                # 30-epoch anchor ties fp32).  It is ~0.1 ms of the
                # 42 ms step — a free island.  bf16 SERVING keeps this
                # stack in bf16 (argmax parity verified separately).
                mdt = None
            if self.group_all:
                new_xyz, grouped = ops.sample_and_group_all(xyz, feats)
            else:
                new_xyz, grouped = ops.sample_and_group(
                    self.npoint, self.radius, self.nsample, xyz, feats,
                    fps_start_idx=_fps_start(self, train, xyz))
            h = SharedMLP(self.mlp, name="mlp", dtype=mdt)(
                grouped, train, bn_momentum)
            return new_xyz, jnp.max(h, axis=2)  # [B,S,C']

        cat = xyz if feats is None else jnp.concatenate([xyz, feats], -1)
        c_in, c1 = cat.shape[-1], self.mlp[0]
        kernel = self.param("proj_kernel", nn.initializers.lecun_normal(),
                            (c_in, c1))
        bias = self.param("proj_bias", nn.initializers.zeros, (c1,))
        # f32 originals, captured BEFORE the bf16 cast: the bf16-train
        # recentering branch below must start from full-precision
        # xyz/weights or the documented cancellation fix runs on
        # already-rounded inputs (ADVICE r2 medium; matches the MSG path)
        cat32, kernel32, bias32 = cat, kernel, bias
        if dt is not None:
            cat = cat.astype(dt)
            kernel = kernel.astype(dt)
            bias = bias.astype(dt)
        pre = cat @ kernel  # [B,N,C1]
        # point-sharding context (parallel/point_shard.py): big-N eval
        # blocks run FPS + the whole SA tail SPMD over the mesh's
        # point axis; trace-time static decision
        from mm3d_tpu.parallel.point_shard import current as _ps_current
        ps = _ps_current()
        # kNN blocks shard too (r5) when every shard's tile holds >= K
        # candidates (sharded_knn_point's local-top-K precondition)
        _nsh = ps.mesh.shape[ps.axis] if ps is not None else 1
        _knn_ok = (not self.knn
                   or xyz.shape[1] // max(_nsh, 1) >= self.nsample)
        use_sharded = (ps is not None and not train and _knn_ok
                       and len(self.mlp) == 3
                       and xyz.shape[1] >= ps.min_points
                       and xyz.shape[1] % _nsh == 0)
        if use_sharded:
            from mm3d_tpu.parallel.sharded_fps import sharded_fps
            # sharded_fps has no start_idx plumbing; safe because this
            # branch is gated on `not train` above and _fps_start only
            # randomizes under train — assert the coupling so a future
            # train-mode point-shard path fails loudly (ADVICE r4)
            assert not train
            fps_idx = sharded_fps(xyz, self.npoint, ps.mesh, ps.axis)
        else:
            fps_idx = ops.farthest_point_sample(
                xyz, self.npoint, _fps_start(self, train, xyz))
        new_xyz = ops.index_points(xyz, fps_idx)
        cterm = new_xyz.astype(pre.dtype) @ kernel[:3]
        bn = BatchNorm(name="proj_bn",
                       dtype=_dbg_dtype("sa_bn", dt))
        rest = (SharedMLP(self.mlp[1:], name="mlp_rest",
                          dtype=_dbg_dtype("sa_rest", dt))
                if len(self.mlp) > 1 else None)

        if use_sharded:
            from mm3d_tpu.parallel.sharded_group import (
                sharded_idx_group_max, sharded_knn_point,
                sharded_sa_group_max)
            A, C = bn(pre, use_running_average=True, fold=True)
            (w1, b1), (w2, b2) = rest(pre, fold=True)
            if self.knn:
                idx = sharded_knn_point(self.nsample, xyz, new_xyz,
                                        ps.mesh, ps.axis)
                out = sharded_idx_group_max(
                    idx, pre * A, (bias - cterm) * A + C, w1, b1, w2,
                    b2, ps.mesh, ps.axis)
            else:
                out = sharded_sa_group_max(
                    self.radius, self.nsample, xyz, new_xyz, pre * A,
                    (bias - cterm) * A + C, w1, b1, w2, b2,
                    ps.mesh, ps.axis)
            return new_xyz, out

        fused = (dispatch.kernel_or_none("fused_sa")
                 if _want_fused_sa(train, self.mlp, self.dtype)
                 and not self.knn else None)
        if fused is not None:
            # eval path: BN folds to an affine map, so the whole SA tail
            # (ball query + gather + MLP + max) runs as ONE Pallas kernel
            # with no [B,S,K,C] HBM round trip (BASELINE.json:5).
            A, C = bn(pre, use_running_average=True, fold=True)
            (w1, b1), (w2, b2) = rest(pre, fold=True)
            out = fused(self.radius, self.nsample, xyz, new_xyz,
                        pre * A, (bias - cterm) * A + C, w1, b1, w2, b2)
            return new_xyz, out

        fused_idx = (dispatch.kernel_or_none("fused_sa_idx")
                     if _want_fused_sa_idx(train, self.mlp, self.dtype,
                                           self.knn, self.nsample,
                                           xyz.shape[1]) else None)
        if fused_idx is not None:
            # kNN serving (VERDICT r4 missing 4): top-K selection stays
            # in XLA; gather + folded-BN MLP + max fuse into one kernel
            # — the grouped [B,S,K,C] tensor never exists in HBM here
            # either
            A, C = bn(pre, use_running_average=True, fold=True)
            (w1, b1), (w2, b2) = rest(pre, fold=True)
            idx = ops.knn_point(self.nsample, xyz, new_xyz)
            out = fused_idx(self.nsample, idx, pre * A,
                            (bias - cterm) * A + C, w1, b1, w2, b2)
            return new_xyz, out

        # Train mode stays on the unfused XLA path deliberately: the
        # streaming fused train-mode SA (exact BN-train VJP, r2) was
        # measured FLOP-bound-slower (94 vs 51 ms step — 8 recompute
        # passes × one-hot builds ≈ 24× the eval kernel's MXU work),
        # the v7 slab-select build lost its on-chip race in BOTH dtypes
        # (r5), and the row-DMA gather measured 9 ns/row vs the 2.8
        # ns/row budget (r5).  The kernel was deleted in r5; the design
        # record lives in docs/fused_sa_kernels.md + BASELINE.md and
        # the implementation in git history (mm3d_tpu/ops/
        # sa_train_kernels.py @ 88fbfa1).  The unfused path's
        # scatter-add backward DOES route through the Pallas
        # gather-backward kernel.
        if self.knn:
            idx = ops.knn_point(self.nsample, xyz, new_xyz)
        else:
            idx = ops.query_ball_point(self.radius, self.nsample,
                                       xyz, new_xyz)
        if dt is not None and train:
            # bf16 training: `gathered - cterm` cancels two O(1) terms
            # to recover the small local-geometry signal — in bf16 that
            # cancellation leaves ~5 bits and training plateaus
            # (measured: train acc stuck ~55% where fp32 reaches 67%+).
            # Recenter in f32, cast after; the extra f32 gather traffic
            # is the price of a trainable bf16 mode.
            pre32 = (cat32.astype(jnp.float32)
                     @ kernel32.astype(jnp.float32))
            ct32 = (new_xyz.astype(jnp.float32)
                    @ kernel32[:3].astype(jnp.float32))
            gathered = ops.index_points(pre32, idx)
            h = (gathered - ct32[:, :, None, :]
                 + bias32.astype(jnp.float32)).astype(
                     _dbg_dtype("sa_h", dt) or jnp.float32)
        else:
            gathered = ops.index_points(pre, idx)  # [B,S,K,C1]
            h = gathered - cterm[:, :, None, :] + bias
        h = bn(h, use_running_average=not train, momentum=bn_momentum)
        h = nn.relu(h)
        if rest is not None:
            h = rest(h, train, bn_momentum)
        return new_xyz, jnp.max(h, axis=2)


class SetAbstractionMsg(nn.Module):
    """Multi-scale grouping SA block: shared centroids, per-scale
    (radius, nsample, mlp) branches, concat over scales."""

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    project_first: bool = True  # see SetAbstraction docstring
    dtype: Optional[object] = None
    f32_train_guard: bool = False  # see SetAbstraction

    @nn.compact
    def __call__(self, xyz, feats, train: bool = True,
                 bn_momentum: float = 0.1):
        dt = guarded_train_dtype(self.dtype, train, self.f32_train_guard)
        # point-sharding context, mirroring SetAbstraction (VERDICT r4
        # weak 4: MSG blocks previously ran unsharded on replicated N
        # under --point_shard, silently)
        from mm3d_tpu.parallel.point_shard import current as _ps_current
        ps = _ps_current()
        use_sharded = (ps is not None and not train and self.project_first
                       and all(len(m) == 3 for m in self.mlp_list)
                       and xyz.shape[1] >= ps.min_points
                       and xyz.shape[1] % ps.mesh.shape[ps.axis] == 0)
        if use_sharded:
            from mm3d_tpu.parallel.sharded_fps import sharded_fps
            assert not train  # _fps_start randomization never applies
            fps_idx = sharded_fps(xyz, self.npoint, ps.mesh, ps.axis)
        else:
            fps_idx = ops.farthest_point_sample(
                xyz, self.npoint, _fps_start(self, train, xyz))
        new_xyz = ops.index_points(xyz, fps_idx)
        cat = xyz if feats is None else jnp.concatenate([xyz, feats], -1)
        outs = []
        for i, (r, k) in enumerate(zip(self.radius_list, self.nsample_list)):
            mlp = self.mlp_list[i]
            if self.project_first:
                kernel = self.param(f"proj_kernel_{i}",
                                    nn.initializers.lecun_normal(),
                                    (cat.shape[-1], mlp[0]))
                bias = self.param(f"proj_bias_{i}", nn.initializers.zeros,
                                  (mlp[0],))
                cati, kerneli, biasi = cat, kernel, bias
                if dt is not None:
                    cati = cat.astype(dt)
                    kerneli = kernel.astype(dt)
                    biasi = bias.astype(dt)
                pre = cati @ kerneli
                cterm = new_xyz.astype(pre.dtype) @ kerneli[:3]
                bn = BatchNorm(name=f"proj_bn_{i}", dtype=dt)
                rest = (SharedMLP(mlp[1:], name=f"mlp_rest_{i}",
                                  dtype=dt)
                        if len(mlp) > 1 else None)
                if use_sharded:
                    # per-scale SPMD SA tail: the same max-distributes-
                    # over-shards identity as the SSG path
                    from mm3d_tpu.parallel.sharded_group import (
                        sharded_sa_group_max)
                    A, C = bn(pre, use_running_average=True, fold=True)
                    (w1, b1), (w2, b2) = rest(pre, fold=True)
                    outs.append(sharded_sa_group_max(
                        r, k, xyz, new_xyz, pre * A,
                        (biasi - cterm) * A + C, w1, b1, w2, b2,
                        ps.mesh, ps.axis))
                    continue
                fused = (dispatch.kernel_or_none("fused_sa")
                         if _want_fused_sa(train, mlp, self.dtype)
                         else None)
                if fused is not None:
                    # one fused kernel per scale (see SetAbstraction)
                    A, C = bn(pre, use_running_average=True, fold=True)
                    (w1, b1), (w2, b2) = rest(pre, fold=True)
                    outs.append(fused(r, k, xyz, new_xyz, pre * A,
                                      (biasi - cterm) * A + C,
                                      w1, b1, w2, b2))
                    continue
                # train mode: unfused by measurement (see SetAbstraction)
                idx = ops.query_ball_point(r, k, xyz, new_xyz)
                if dt is not None and train:
                    # f32 recentering under bf16 training — see
                    # SetAbstraction (cancellation eats the local
                    # geometry signal in bf16)
                    pre32 = (cat.astype(jnp.float32)
                             @ kernel.astype(jnp.float32))
                    ct32 = (new_xyz.astype(jnp.float32)
                            @ kernel[:3].astype(jnp.float32))
                    gathered = ops.index_points(pre32, idx)
                    h = (gathered - ct32[:, :, None, :]
                         + bias.astype(jnp.float32)).astype(dt)
                else:
                    gathered = ops.index_points(pre, idx)
                    h = gathered - cterm[:, :, None, :] + biasi
                h = bn(h, use_running_average=not train,
                       momentum=bn_momentum)
                h = nn.relu(h)
                if rest is not None:
                    h = rest(h, train, bn_momentum)
            else:
                idx = ops.query_ball_point(r, k, xyz, new_xyz)
                grouped_xyz = (ops.index_points(xyz, idx)
                               - new_xyz[:, :, None, :])
                if feats is not None:
                    grouped = jnp.concatenate(
                        [grouped_xyz, ops.index_points(feats, idx)], -1)
                else:
                    grouped = grouped_xyz
                h = SharedMLP(mlp, name=f"mlp_{i}")(grouped, train,
                                                    bn_momentum)
            outs.append(jnp.max(h, axis=2))
        return new_xyz, jnp.concatenate(outs, -1)


class FeaturePropagation(nn.Module):
    """FP decoder block: 3-NN inverse-distance upsample + skip + MLP.

    TPU optimization (`project_first`, mirrors SetAbstraction): the
    inverse-distance interpolation is linear, so the first MLP layer
    commutes with it:

        [skip, interp(f2)] @ W0 + b0
            = skip @ W0_skip + interp(f2 @ W0_f2) + b0

    The heavy layer-0 matmul runs on the M sparse points instead of the
    N dense ones (M << N), and the skip branch's matmul is separate —
    numerically identical up to fp32 reassociation.
    """

    mlp: Sequence[int]
    dtype: Optional[object] = None
    project_first: bool = True

    @nn.compact
    def __call__(self, xyz1, xyz2, feats1, feats2, train: bool = True,
                 bn_momentum: float = 0.1):
        # xyz1 [B,N,3] dense targets; xyz2 [B,M,3] sparse sources
        B, N, _ = xyz1.shape
        M = xyz2.shape[1]

        if not self.project_first:
            if M == 1:
                interpolated = jnp.broadcast_to(
                    feats2, (B, N, feats2.shape[-1]))
            else:
                dists, idx = ops.three_nn(xyz1, xyz2)
                weight = ops.geometry.interpolation_weights(dists)
                interpolated = ops.three_interpolate(feats2, idx, weight)
            if feats1 is not None:
                interpolated = jnp.concatenate(
                    [feats1.astype(interpolated.dtype), interpolated], -1)
            return SharedMLP(self.mlp, name="mlp", dtype=self.dtype)(
                interpolated, train, bn_momentum)

        c1 = self.mlp[0]
        c2 = feats2.shape[-1]
        k2 = self.param("proj_kernel", nn.initializers.lecun_normal(),
                        (c2 + (feats1.shape[-1] if feats1 is not None else 0),
                         c1))
        bias = self.param("proj_bias", nn.initializers.zeros, (c1,))
        if self.dtype is not None:
            feats2 = feats2.astype(self.dtype)
            k2 = k2.astype(self.dtype)
            bias = bias.astype(self.dtype)
        # rows of W0: [skip channels; interpolated channels]
        k_skip, k_interp = k2[:-c2], k2[-c2:]
        pre = feats2 @ k_interp  # [B,M,C1] — on the sparse set
        bn = BatchNorm(name="proj_bn", dtype=self.dtype)
        # point-sharding context: the dense axis of a big cloud stays
        # sharded through the FP tail (each row's 3-NN/interp is
        # independent of the others — see parallel.sharded_group
        # .sharded_fp); eval only, same folded form as the fused kernel
        from mm3d_tpu.parallel.point_shard import current as _ps_current
        ps = _ps_current()
        use_ps = (ps is not None and not train and M > 1
                  and N >= ps.min_points
                  and N % ps.mesh.shape[ps.axis] == 0)
        fused = (dispatch.kernel_or_none("fused_fp")
                 if _want_fused_fp(train) and M > 1 else None)
        if use_ps or fused is not None:
            # eval path: three_nn + inverse-distance interp + skip +
            # folded-BN relu as ONE fused stage (Pallas kernel, or the
            # point-sharded SPMD twin of the same folded form) — BN's
            # per-channel scale commutes with the linear interpolation,
            # so the stage sees pre*A and the folded dense-side term
            A, C = bn(pre, use_running_average=True, fold=True)
            skip_t = jnp.broadcast_to(bias.astype(pre.dtype), (B, N, c1))
            if feats1 is not None:
                skip_t = feats1.astype(pre.dtype) @ k_skip + skip_t
            if use_ps:
                from mm3d_tpu.parallel.sharded_group import sharded_fp
                h = sharded_fp(xyz1, xyz2, pre * A, skip_t * A + C,
                               ps.mesh, ps.axis)
            else:
                h = fused(xyz1, xyz2, pre * A, skip_t * A + C)
        else:
            if M == 1:
                h = jnp.broadcast_to(pre, (B, N, c1))
            else:
                dists, idx = ops.three_nn(xyz1, xyz2)
                weight = ops.geometry.interpolation_weights(dists)
                h = ops.three_interpolate(pre, idx,
                                          weight.astype(pre.dtype))
            if feats1 is not None:
                h = h + feats1.astype(pre.dtype) @ k_skip
            h = h + bias
            h = bn(h, use_running_average=not train, momentum=bn_momentum)
            h = nn.relu(h)
        if len(self.mlp) > 1:
            h = SharedMLP(self.mlp[1:], name="mlp_rest",
                          dtype=self.dtype)(h, train, bn_momentum)
        return h


# --------------------------------------------------------------- cls models


class PointNet2ClsSSG(nn.Module):
    """Config 2 (BASELINE.json:8): PointNet++ SSG classification."""

    num_class: int = 40
    normal_channel: bool = False
    knn: bool = False  # kNN-grouping variant (exceeds-lineage option)
    dtype: Optional[object] = None  # bf16 inference mode

    @nn.compact
    def __call__(self, points, train: bool = True, bn_momentum: float = 0.1,
                 deterministic: Optional[bool] = None):
        det = (not train) if deterministic is None else deterministic
        sa_dt = _dbg_dtype("sa", self.dtype)
        hd_dt = _dbg_dtype("head", self.dtype)
        xyz = points[..., :3]
        feats = points[..., 3:6] if self.normal_channel else None
        xyz, f = SetAbstraction(512, 0.2, 32, (64, 64, 128), name="sa1",
                                knn=self.knn,
                                dtype=sa_dt)(xyz, feats, train,
                                             bn_momentum)
        xyz, f = SetAbstraction(128, 0.4, 64, (128, 128, 256), name="sa2",
                                knn=self.knn,
                                dtype=sa_dt)(xyz, f, train, bn_momentum)
        _, f = SetAbstraction(mlp=(256, 512, 1024), group_all=True,
                              name="sa3", dtype=_dbg_dtype(
                                  "sa3", sa_dt))(
                                  xyz, f, train, bn_momentum)
        h = f[:, 0]  # [B,1024]
        for i, (w, p) in enumerate(((512, 0.4), (256, 0.4))):
            h = nn.Dense(w, name=f"fc{i+1}", dtype=hd_dt)(h)
            h = BatchNorm(name=f"bn{i+1}", dtype=hd_dt)(
                h, use_running_average=not train, momentum=bn_momentum)
            h = nn.relu(h)
            h = nn.Dropout(p, deterministic=det, name=f"drop{i+1}")(h)
        h = nn.Dense(self.num_class, name="fc3", dtype=hd_dt)(h)
        return log_softmax_head(h.astype(jnp.float32)), {"trans_feat": None}


class PointNet2ClsMSG(nn.Module):
    """PointNet++ MSG classification (canonical multi-scale config)."""

    num_class: int = 40
    normal_channel: bool = False
    dtype: Optional[object] = None  # bf16 serving/mixed-precision mode

    @nn.compact
    def __call__(self, points, train: bool = True, bn_momentum: float = 0.1,
                 deterministic: Optional[bool] = None):
        det = (not train) if deterministic is None else deterministic
        xyz = points[..., :3]
        feats = points[..., 3:6] if self.normal_channel else None
        xyz, f = SetAbstractionMsg(
            512, (0.1, 0.2, 0.4), (16, 32, 128),
            ((32, 32, 64), (64, 64, 128), (64, 96, 128)), name="sa1",
            dtype=self.dtype)(xyz, feats, train, bn_momentum)
        xyz, f = SetAbstractionMsg(
            128, (0.2, 0.4, 0.8), (32, 64, 128),
            ((64, 64, 128), (128, 128, 256), (128, 128, 256)), name="sa2",
            dtype=self.dtype)(xyz, f, train, bn_momentum)
        _, f = SetAbstraction(mlp=(256, 512, 1024), group_all=True,
                              name="sa3", dtype=self.dtype)(
                                  xyz, f, train, bn_momentum)
        h = f[:, 0]
        for i, (w, p) in enumerate(((512, 0.4), (256, 0.5))):
            h = nn.Dense(w, name=f"fc{i+1}", dtype=self.dtype)(h)
            h = BatchNorm(name=f"bn{i+1}", dtype=self.dtype)(
                h, use_running_average=not train, momentum=bn_momentum)
            h = nn.relu(h)
            h = nn.Dropout(p, deterministic=det, name=f"drop{i+1}")(h)
        h = nn.Dense(self.num_class, name="fc3", dtype=self.dtype)(h)
        return log_softmax_head(h.astype(jnp.float32)), {"trans_feat": None}


# ----------------------------------------------------------- part-seg models


class PointNet2PartSegSSG(nn.Module):
    """Config 3 fabric (BASELINE.json:9): SSG encoder + FP decoder,
    one-hot category conditioning, per-point num_part logits."""

    num_part: int = 50
    num_category: int = 16
    normal_channel: bool = False
    dtype: Optional[object] = None  # bf16 serving/mixed-precision mode

    @nn.compact
    def __call__(self, points, cls_label_onehot, train: bool = True,
                 bn_momentum: float = 0.1, deterministic: Optional[bool] = None):
        det = (not train) if deterministic is None else deterministic
        B, N, _ = points.shape
        l0_xyz = points[..., :3]
        l0_feats = points if self.normal_channel else None
        l1_xyz, l1_f = SetAbstraction(512, 0.2, 32, (64, 64, 128),
                                      name="sa1", dtype=self.dtype)(l0_xyz, l0_feats, train,
                                                  bn_momentum)
        l2_xyz, l2_f = SetAbstraction(128, 0.4, 64, (128, 128, 256),
                                      name="sa2", dtype=self.dtype)(l1_xyz, l1_f, train,
                                                  bn_momentum)
        l3_xyz, l3_f = SetAbstraction(mlp=(256, 512, 1024), group_all=True,
                                      name="sa3", dtype=self.dtype)(l2_xyz, l2_f, train,
                                                  bn_momentum)
        l2_f = FeaturePropagation((256, 256), name="fp3", dtype=self.dtype)(
            l2_xyz, l3_xyz, l2_f, l3_f, train, bn_momentum)
        l1_f = FeaturePropagation((256, 128), name="fp2", dtype=self.dtype)(
            l1_xyz, l2_xyz, l1_f, l2_f, train, bn_momentum)
        cls_tiled = jnp.broadcast_to(
            cls_label_onehot[:, None, :].astype(points.dtype),
            (B, N, self.num_category))
        l0_skip = jnp.concatenate([cls_tiled, l0_xyz, points], -1)
        l0_f = FeaturePropagation((128, 128, 128), name="fp1", dtype=self.dtype)(
            l0_xyz, l1_xyz, l0_skip, l1_f, train, bn_momentum)
        h = SharedMLP([128], name="head_mlp", dtype=self.dtype)(l0_f, train, bn_momentum)
        h = nn.Dropout(0.5, deterministic=det, name="drop")(h)
        h = nn.Dense(self.num_part, name="head_out", dtype=self.dtype)(h)
        return log_softmax_head(h.astype(jnp.float32)), {"trans_feat": None}


class PointNet2PartSegMSG(nn.Module):
    """Config 3 (BASELINE.json:9): PointNet++ MSG part segmentation."""

    num_part: int = 50
    num_category: int = 16
    normal_channel: bool = False
    dtype: Optional[object] = None  # bf16 serving/mixed-precision mode

    @nn.compact
    def __call__(self, points, cls_label_onehot, train: bool = True,
                 bn_momentum: float = 0.1, deterministic: Optional[bool] = None):
        det = (not train) if deterministic is None else deterministic
        B, N, _ = points.shape
        l0_xyz = points[..., :3]
        l0_feats = points if self.normal_channel else None
        l1_xyz, l1_f = SetAbstractionMsg(
            512, (0.1, 0.2, 0.4), (32, 64, 128),
            ((32, 32, 64), (64, 64, 128), (64, 96, 128)), name="sa1", dtype=self.dtype)(
                l0_xyz, l0_feats, train, bn_momentum)
        l2_xyz, l2_f = SetAbstractionMsg(
            128, (0.4, 0.8), (64, 128),
            ((128, 128, 256), (128, 196, 256)), name="sa2", dtype=self.dtype)(
                l1_xyz, l1_f, train, bn_momentum)
        l3_xyz, l3_f = SetAbstraction(mlp=(256, 512, 1024), group_all=True,
                                      name="sa3", dtype=self.dtype)(l2_xyz, l2_f, train,
                                                  bn_momentum)
        l2_f = FeaturePropagation((256, 256), name="fp3", dtype=self.dtype)(
            l2_xyz, l3_xyz, l2_f, l3_f, train, bn_momentum)
        l1_f = FeaturePropagation((256, 128), name="fp2", dtype=self.dtype)(
            l1_xyz, l2_xyz, l1_f, l2_f, train, bn_momentum)
        cls_tiled = jnp.broadcast_to(
            cls_label_onehot[:, None, :].astype(points.dtype),
            (B, N, self.num_category))
        l0_skip = jnp.concatenate([cls_tiled, l0_xyz, points], -1)
        l0_f = FeaturePropagation((128, 128), name="fp1", dtype=self.dtype)(
            l0_xyz, l1_xyz, l0_skip, l1_f, train, bn_momentum)
        h = SharedMLP([128], name="head_mlp", dtype=self.dtype)(l0_f, train, bn_momentum)
        h = nn.Dropout(0.5, deterministic=det, name="drop")(h)
        h = nn.Dense(self.num_part, name="head_out", dtype=self.dtype)(h)
        return log_softmax_head(h.astype(jnp.float32)), {"trans_feat": None}


# ------------------------------------------------------------ semseg models


class PointNet2SemSeg(nn.Module):
    """PointNet++ semantic segmentation (SSG, 4 SA + 4 FP stages)."""

    num_class: int = 13
    dtype: Optional[object] = None  # bf16 serving/mixed-precision mode

    @nn.compact
    def __call__(self, points, train: bool = True, bn_momentum: float = 0.1,
                 deterministic: Optional[bool] = None):
        det = (not train) if deterministic is None else deterministic
        sa_dt = _dbg_dtype("sa", self.dtype)
        fp_dt = _dbg_dtype("fp", self.dtype)
        hd_dt = _dbg_dtype("head", self.dtype)
        l0_xyz = points[..., :3]
        l0_f = points  # 9-dim block features
        l1_xyz, l1_f = SetAbstraction(1024, 0.1, 32, (32, 32, 64),
                                      name="sa1",
                                      f32_train_guard=True,
                                      dtype=_dbg_dtype("sa1", sa_dt))(l0_xyz, l0_f, train,
                                                  bn_momentum)
        l2_xyz, l2_f = SetAbstraction(256, 0.2, 32, (64, 64, 128),
                                      name="sa2", dtype=_dbg_dtype("sa2", sa_dt))(l1_xyz, l1_f, train,
                                                  bn_momentum)
        l3_xyz, l3_f = SetAbstraction(64, 0.4, 32, (128, 128, 256),
                                      name="sa3", dtype=_dbg_dtype("sa3", sa_dt))(l2_xyz, l2_f, train,
                                                  bn_momentum)
        l4_xyz, l4_f = SetAbstraction(16, 0.8, 32, (256, 256, 512),
                                      name="sa4", dtype=_dbg_dtype("sa4", sa_dt))(l3_xyz, l3_f, train,
                                                  bn_momentum)
        l3_f = FeaturePropagation((256, 256), name="fp4", dtype=fp_dt)(
            l3_xyz, l4_xyz, l3_f, l4_f, train, bn_momentum)
        l2_f = FeaturePropagation((256, 256), name="fp3", dtype=fp_dt)(
            l2_xyz, l3_xyz, l2_f, l3_f, train, bn_momentum)
        l1_f = FeaturePropagation((256, 128), name="fp2", dtype=fp_dt)(
            l1_xyz, l2_xyz, l1_f, l2_f, train, bn_momentum)
        l0_f = FeaturePropagation((128, 128, 128), name="fp1", dtype=fp_dt)(
            l0_xyz, l1_xyz, None, l1_f, train, bn_momentum)
        h = SharedMLP([128], name="head_mlp", dtype=hd_dt)(l0_f, train, bn_momentum)
        h = nn.Dropout(0.5, deterministic=det, name="drop")(h)
        h = nn.Dense(self.num_class, name="head_out", dtype=hd_dt)(h)
        return log_softmax_head(h.astype(jnp.float32)), {"trans_feat": None}


class PointNet2SemSegMSG(nn.Module):
    """PointNet++ MSG semantic segmentation."""

    num_class: int = 13
    dtype: Optional[object] = None  # bf16 serving/mixed-precision mode

    @nn.compact
    def __call__(self, points, train: bool = True, bn_momentum: float = 0.1,
                 deterministic: Optional[bool] = None):
        det = (not train) if deterministic is None else deterministic
        l0_xyz = points[..., :3]
        l0_f = points
        l1_xyz, l1_f = SetAbstractionMsg(
            1024, (0.05, 0.1), (16, 32), ((16, 16, 32), (32, 32, 64)),
            name="sa1", f32_train_guard=True,
            dtype=self.dtype)(l0_xyz, l0_f, train, bn_momentum)
        l2_xyz, l2_f = SetAbstractionMsg(
            256, (0.1, 0.2), (16, 32), ((64, 64, 128), (64, 96, 128)),
            name="sa2", dtype=self.dtype)(l1_xyz, l1_f, train, bn_momentum)
        l3_xyz, l3_f = SetAbstractionMsg(
            64, (0.2, 0.4), (16, 32), ((128, 196, 256), (128, 196, 256)),
            name="sa3", dtype=self.dtype)(l2_xyz, l2_f, train, bn_momentum)
        l4_xyz, l4_f = SetAbstractionMsg(
            16, (0.4, 0.8), (16, 32), ((256, 256, 512), (256, 384, 512)),
            name="sa4", dtype=self.dtype)(l3_xyz, l3_f, train, bn_momentum)
        l3_f = FeaturePropagation((256, 256), name="fp4", dtype=self.dtype)(
            l3_xyz, l4_xyz, l3_f, l4_f, train, bn_momentum)
        l2_f = FeaturePropagation((256, 256), name="fp3", dtype=self.dtype)(
            l2_xyz, l3_xyz, l2_f, l3_f, train, bn_momentum)
        l1_f = FeaturePropagation((256, 128), name="fp2", dtype=self.dtype)(
            l1_xyz, l2_xyz, l1_f, l2_f, train, bn_momentum)
        l0_f = FeaturePropagation((128, 128, 128), name="fp1", dtype=self.dtype)(
            l0_xyz, l1_xyz, None, l1_f, train, bn_momentum)
        h = SharedMLP([128], name="head_mlp", dtype=self.dtype)(l0_f, train, bn_momentum)
        h = nn.Dropout(0.5, deterministic=det, name="drop")(h)
        h = nn.Dense(self.num_class, name="head_out", dtype=self.dtype)(h)
        return log_softmax_head(h.astype(jnp.float32)), {"trans_feat": None}
