"""Whole-scene semantic-segmentation evaluation (the reference's
test_semseg protocol, SURVEY.md §2.4): a full room is tiled into
overlapping fixed-size blocks, each block is predicted by the jitted
model, and per-point class probabilities are vote-accumulated back onto
the original points; metrics are computed over the whole scene.

All block predictions run on device in fixed shapes; only the final
per-point argmax comes back to the host.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mm3d_tpu.utils import metrics as M


def block_point_lists(xyz: np.ndarray, block_size: float = 1.0,
                      stride: float = 0.5):
    """Seed-independent tiling: the per-block point-index lists.

    Candidate prefilter via stride-cell binning — O(N + blocks·cand)
    instead of a full N-point mask per grid cell (O(blocks·N): minutes
    of pure host stall on ~1M-point rooms, repeated per vote).  The
    exact bounds test on the candidates keeps selection identical; ±1
    cell of slack absorbs float-boundary effects.  Only EMPTY blocks
    are skipped (the reference convention — a 16-point floor silently
    zero-voted sparse-region points into class 0; code-review r5).
    """
    xmin, ymin = float(xyz[:, 0].min()), float(xyz[:, 1].min())
    xs = np.arange(xmin, xyz[:, 0].max() + 1e-6, stride)
    ys = np.arange(ymin, xyz[:, 1].max() + 1e-6, stride)
    cx = np.floor((xyz[:, 0] - xmin) / stride).astype(np.int64)
    cy = np.floor((xyz[:, 1] - ymin) / stride).astype(np.int64)
    ncy = int(cy.max()) + 2
    keys = cx * ncy + cy
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    uniq, starts = np.unique(sk, return_index=True)
    bounds = np.append(starts, len(sk))
    cells = {int(u): order[s:e]
             for u, s, e in zip(uniq, bounds[:-1], bounds[1:])}
    r = int(np.ceil(block_size / stride)) + 1
    sels = []
    for a, x0 in enumerate(xs):
        for b, y0 in enumerate(ys):
            cand = [cells[c] for c in
                    (ccx * ncy + ccy
                     for ccx in range(a - 1, a + r)
                     for ccy in range(b - 1, b + r)) if c in cells]
            if not cand:
                continue
            cand = np.concatenate(cand)
            cm = ((xyz[cand, 0] >= x0) & (xyz[cand, 0] < x0 + block_size)
                  & (xyz[cand, 1] >= y0) & (xyz[cand, 1] < y0 + block_size))
            sel = np.sort(cand[cm])
            if len(sel):
                sels.append(sel)
    return sels


def tile_scene(xyz: np.ndarray, rgb: Optional[np.ndarray],
               npoints: int = 4096, block_size: float = 1.0,
               stride: float = 0.5, seed: int = 0, block_lists=None):
    """Tile a room into overlapping blocks of exactly `npoints` points.

    Returns (features [nblocks, npoints, 9], point_idx [nblocks, npoints])
    where point_idx maps each block row back to the original point id
    (points are re-sampled with replacement when a block is small, so a
    point can appear several times — votes accumulate).

    `block_lists` (from `block_point_lists`) can be precomputed once and
    reused across votes — block membership is seed-independent; only the
    per-block subsampling varies with `seed`.
    """
    from mm3d_tpu.data.loaders import semseg_block_features
    rng = np.random.RandomState(seed)
    room_min = xyz.min(0)
    room_extent = xyz.max(0) - room_min
    if rgb is None:
        rgb = np.zeros_like(xyz)
    if rgb.max() > 1.5:
        rgb = rgb / 255.0
    if block_lists is None:
        block_lists = block_point_lists(xyz, block_size, stride)
    feats_l, idx_l = [], []
    for sel in block_lists:
        # cover EVERY point in the block: shuffle and emit
        # ceil(n/npoints) tiles, padding the last by resampling
        sel = rng.permutation(sel)
        nchunks = max(1, int(np.ceil(len(sel) / npoints)))
        for c in range(nchunks):
            choice = sel[c * npoints:(c + 1) * npoints]
            if len(choice) < npoints:
                extra = rng.choice(sel, npoints - len(choice),
                                   replace=len(sel) < npoints)
                choice = np.concatenate([choice, extra])
            feats_l.append(semseg_block_features(
                xyz[choice], rgb[choice], room_min, room_extent))
            idx_l.append(choice.astype(np.int32))
    if not feats_l:
        raise ValueError("scene produced no blocks")
    return np.stack(feats_l), np.stack(idx_l)


@functools.partial(jax.jit, donate_argnums=0)
def _accumulate_votes(votes, pidx, log_probs, live):
    """Scatter-add one batch of block probabilities into the room-sized
    vote buffer, entirely on device (VERDICT r1 weak-5: the host
    `np.add.at` loop serializes at real room scale ~1M pts x 13 cls).
    The exp lives in here too — an eager per-batch exp through the
    remote tunnel costs 10-50x its jitted price (CLAUDE.md).

    votes [Nroom, C] (donated), pidx [B, npoints] int32,
    log_probs [B, npoints, C], live [B] 0/1 mask for padding blocks.
    """
    C = votes.shape[-1]
    contrib = jnp.exp(log_probs) * live[:, None, None]
    return votes.at[pidx.reshape(-1)].add(contrib.reshape(-1, C))


def _vote_loop(predict_fn, arrays, pidx, nblocks, batch_size,
               n_room, num_classes):
    """Wrap-pad the per-block arrays, batch them through predict_fn and
    vote-accumulate on device.  Shared by the point-only and multimodal
    room protocols (the wrap-padding subtlety lives in ONE place)."""
    pad = (-nblocks) % batch_size
    if pad:
        # wrap-around: pad can exceed nblocks for tiny rooms
        rep = np.resize(np.arange(nblocks), pad)
        arrays = [np.concatenate([a, a[rep]], 0) for a in arrays]
        pidx = np.concatenate([pidx, pidx[rep]], 0)
    votes = jnp.zeros((n_room, num_classes), jnp.float32)
    for s in range(0, nblocks + pad, batch_size):
        sl = slice(s, s + batch_size)
        logp = predict_fn(*(jnp.asarray(a[sl]) for a in arrays))
        live = jnp.asarray(
            (s + np.arange(batch_size) < nblocks).astype(np.float32))
        votes = _accumulate_votes(votes, jnp.asarray(pidx[sl]), logp, live)
    return np.asarray(votes)  # single D2H fetch of the whole room


def evaluate_scene(predict_fn: Callable, xyz: np.ndarray,
                   labels: Optional[np.ndarray] = None,
                   rgb: Optional[np.ndarray] = None,
                   num_classes: int = 13, npoints: int = 4096,
                   block_size: float = 1.0, stride: float = 0.5,
                   batch_size: int = 8, seed: int = 0,
                   num_votes: int = 1
                   ) -> Tuple[np.ndarray, Dict[str, float]]:
    """Predict per-point labels for a whole room.

    predict_fn: jitted (points [B, npoints, 9]) -> log_probs
    [B, npoints, C].  Returns (pred [N] int labels, metrics dict —
    empty unless `labels` given).

    num_votes > 1 re-subsamples each block's npoints with a fresh seed
    per vote and accumulates probabilities (the reference test_semseg's
    --num_votes); the tiling grid is deterministic, so every vote
    reuses the compiled predictor.
    """
    bl = block_point_lists(xyz, block_size, stride)  # seed-independent
    votes = None
    for v in range(num_votes):
        feats, pidx = tile_scene(xyz, rgb, npoints, block_size, stride,
                                 seed + v, block_lists=bl)
        vv = _vote_loop(predict_fn, [feats], pidx, feats.shape[0],
                        batch_size, len(xyz), num_classes)
        votes = vv if votes is None else votes + vv
    return _finish(votes, labels, num_classes)


def room_confusion(pred: np.ndarray, labels: np.ndarray,
                   num_classes: int) -> np.ndarray:
    """[C,C] confusion (rows = true) — host bincount; shared by the
    single-room metrics and the whole-area aggregation (test.py --scene
    on a directory), so the two can't drift.

    Labels outside [0, num_classes) — ignore markers like -1/255, or a
    --seg_classes/checkpoint mismatch — are excluded instead of
    crashing the reshape after all the block prediction has already run
    (code-review r5)."""
    labels = labels.astype(np.int64)
    valid = (labels >= 0) & (labels < num_classes)
    return np.bincount(
        labels[valid] * num_classes + pred.astype(np.int64)[valid],
        minlength=num_classes * num_classes
    ).reshape(num_classes, num_classes)


def metrics_from_confusion(cm: np.ndarray) -> Dict[str, float]:
    """point_acc + mIoU over classes present in labels or predictions
    (the reference's whole-area convention)."""
    inter = np.diag(cm).astype(np.float64)
    union = cm.sum(0) + cm.sum(1) - np.diag(cm)
    present = (cm.sum(1) > 0) | (cm.sum(0) > 0)
    iou = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
    total = cm.sum()
    return {
        "point_acc": float(inter.sum() / max(total, 1)),
        "miou": float(iou[present].mean()) if present.any() else 1.0,
    }


def _finish(votes, labels, num_classes):
    seen = votes.sum(-1) > 0
    pred = votes.argmax(-1).astype(np.int32)
    metrics: Dict[str, float] = {"coverage": float(seen.mean())}
    if labels is not None:
        # the reference protocol scores EVERY point: uncovered points
        # keep their (arbitrary, class-0) prediction and count as
        # wrong rather than silently inflating the metrics; `coverage`
        # reports the fraction of points receiving >=1 vote.  Host
        # bincount — everything
        # is already numpy after the single D2H fetch, and eager device
        # ops through the tunnel cost 10-50x.
        cm = room_confusion(pred, labels, num_classes)
        metrics.update(metrics_from_confusion(cm))
        # stashed for whole-area aggregation (test.py --scene DIR): the
        # O(N) host bincount runs once, not once per consumer
        metrics["_cm"] = cm
    return pred, metrics


def render_block_views(feats: np.ndarray, hw=(64, 64), seed: int = 0):
    """Per-block camera views for the multimodal room protocol.

    For each tiled block, renders a depth view of the block's local xyz
    (feats[..., :3] — the recentered coordinates the fusion model also
    projects) from a deterministic per-block viewpoint, exactly like the
    SyntheticMultimodal pairing (data/synthetic.py).

    Returns (images [nb,H,W,3], K [nb,3,3], R [nb,3,3], t [nb,3]).
    """
    from mm3d_tpu.data.synthetic import (default_intrinsics,
                                         random_viewpoint_extrinsics,
                                         render_depth_image)
    Kin = default_intrinsics(hw)
    imgs, Rs, ts = [], [], []
    for b in range(feats.shape[0]):
        rng = np.random.RandomState((seed * 7_000_003 + b) % (2**32))
        # the SHARED pose helper: eval-time views must come from the
        # distribution the fusion models trained on (code-review r5)
        R, t = random_viewpoint_extrinsics(rng)
        imgs.append(render_depth_image(feats[b, :, :3], Kin, R, t, hw))
        Rs.append(R)
        ts.append(t)
    nb = feats.shape[0]
    return (np.stack(imgs), np.broadcast_to(Kin, (nb, 3, 3)).copy(),
            np.stack(Rs), np.stack(ts))


def evaluate_scene_multimodal(predict_fn: Callable, xyz: np.ndarray,
                              labels: Optional[np.ndarray] = None,
                              rgb: Optional[np.ndarray] = None,
                              num_classes: int = 13, npoints: int = 2048,
                              hw=(64, 64), block_size: float = 1.0,
                              stride: float = 0.5, batch_size: int = 8,
                              seed: int = 0, num_votes: int = 1
                              ) -> Tuple[np.ndarray, Dict[str, float]]:
    """Whole-room protocol for the multimodal per-point model (config 5):
    same tiling/vote accumulation as `evaluate_scene`, with a rendered
    camera view per block fed to the fusion branch.

    predict_fn: jitted (points [B,npoints,9], image [B,H,W,3], K, R, t)
    -> log_probs [B,npoints,C].  num_votes as in evaluate_scene (the
    per-vote seed also re-renders the block views from fresh
    viewpoints, adding view diversity to the ensemble).
    """
    bl = block_point_lists(xyz, block_size, stride)  # seed-independent
    votes = None
    for v in range(num_votes):
        feats, pidx = tile_scene(xyz, rgb, npoints, block_size, stride,
                                 seed + v, block_lists=bl)
        imgs, Kin, Rm, tm = render_block_views(feats, hw, seed + v)
        vv = _vote_loop(predict_fn, [feats, imgs, Kin, Rm, tm], pidx,
                        feats.shape[0], batch_size, len(xyz), num_classes)
        votes = vv if votes is None else votes + vv
    return _finish(votes, labels, num_classes)
