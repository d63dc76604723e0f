"""On-device point-cloud augmentation (the provider.py op set, TPU-native).

The reference lineage applies numpy augmentations per batch on the host
inside the train loop (SURVEY.md §2.2 / §3.1) — a known input stall.
Here every augmentation is a pure, key-based jax function over a batch
``[B, N, C]`` (xyz in channels 0:3, optional normals in 3:6), designed to
be fused into the jitted train step so preprocessing never stalls the
accelerator (BASELINE.json:5).

Semantics mirror the canonical provider.py definitions:

* ``rotate_point_cloud``      — per-cloud uniform rotation about the Y axis
  (gravity-aligned up in ModelNet), xyz only; ``*_with_normal`` rotates
  normals with the same matrix.
* ``rotate_point_cloud_z``    — about Z (the semseg convention).
* ``rotate_perturbation``     — small random Euler perturbation,
  R = Rz @ Ry @ Rx with angles clip(sigma*N(0,1), ±clip).
* ``jitter``                  — clipped gaussian noise on every channel of xyz.
* ``shift`` / ``random_scale``— per-cloud translation U(-0.1,0.1) / scale
  U(0.8,1.25) on xyz.
* ``random_point_dropout``    — per cloud, ratio U(0, max_dropout); dropped
  points are replaced by the first point (shape stays static).
* ``shuffle_points``          — random permutation of the N axis.
* ``pc_normalize``            — center to centroid, scale to unit sphere.

Each op also has a numpy twin in ``host_np`` (same math, numpy RNG) for
host-side pipelines and for the torch oracle's input stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- helpers

def _rot_y(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([c, z, s], -1),
         jnp.stack([z, o, z], -1),
         jnp.stack([-s, z, c], -1)], -2)  # [..., 3, 3]


def _rot_z(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([c, -s, z], -1),
         jnp.stack([s, c, z], -1),
         jnp.stack([z, z, o], -1)], -2)


def _rot_x(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([o, z, z], -1),
         jnp.stack([z, c, -s], -1),
         jnp.stack([z, s, c], -1)], -2)


def _apply_rot(batch: jax.Array, rot: jax.Array, rotate_normals: bool) -> jax.Array:
    """batch [B,N,C], rot [B,3,3]; rotates xyz (and normals at 3:6)."""
    # HIGHEST: augmented streams feed fp32 parity comparisons; the default
    # bf16 matmul pass would perturb coordinates by ~1e-3.
    hp = jax.lax.Precision.HIGHEST
    xyz = jnp.einsum("bnc,bdc->bnd", batch[..., :3], rot, precision=hp)
    parts = [xyz]
    if rotate_normals and batch.shape[-1] >= 6:
        nrm = jnp.einsum("bnc,bdc->bnd", batch[..., 3:6], rot, precision=hp)
        parts += [nrm, batch[..., 6:]]
    else:
        parts += [batch[..., 3:]]
    return jnp.concatenate(parts, axis=-1)


# ------------------------------------------------------------ jax (device)

def rotate_point_cloud(key, batch, rotate_normals=False):
    """Uniform random rotation about Y, per cloud."""
    angle = jax.random.uniform(key, (batch.shape[0],)) * 2.0 * jnp.pi
    return _apply_rot(batch, _rot_y(angle), rotate_normals)


def rotate_point_cloud_z(key, batch, rotate_normals=False):
    """Uniform random rotation about Z, per cloud (semseg convention)."""
    angle = jax.random.uniform(key, (batch.shape[0],)) * 2.0 * jnp.pi
    return _apply_rot(batch, _rot_z(angle), rotate_normals)


def rotate_perturbation_point_cloud(key, batch, angle_sigma=0.06,
                                    angle_clip=0.18, rotate_normals=False):
    """Small random Euler-angle perturbation: R = Rz @ Ry @ Rx."""
    ang = jnp.clip(
        angle_sigma * jax.random.normal(key, (batch.shape[0], 3)),
        -angle_clip, angle_clip)
    rot = _rot_z(ang[:, 2]) @ _rot_y(ang[:, 1]) @ _rot_x(ang[:, 0])
    return _apply_rot(batch, rot, rotate_normals)


def jitter_point_cloud(key, batch, sigma=0.01, clip=0.05):
    """Clipped per-point gaussian jitter on xyz."""
    noise = jnp.clip(
        sigma * jax.random.normal(key, batch[..., :3].shape), -clip, clip)
    return batch.at[..., :3].add(noise)


def shift_point_cloud(key, batch, shift_range=0.1):
    """Per-cloud translation U(-shift_range, shift_range) on xyz."""
    shift = jax.random.uniform(
        key, (batch.shape[0], 1, 3), minval=-shift_range, maxval=shift_range)
    return batch.at[..., :3].add(shift)


def random_scale_point_cloud(key, batch, scale_low=0.8, scale_high=1.25):
    """Per-cloud isotropic scale U(scale_low, scale_high) on xyz."""
    scale = jax.random.uniform(
        key, (batch.shape[0], 1, 1), minval=scale_low, maxval=scale_high)
    return batch.at[..., :3].multiply(scale)


def random_point_dropout(key, batch, max_dropout_ratio=0.875):
    """Replace a random fraction U(0, max) of points with the first point."""
    b, n, _ = batch.shape
    k1, k2 = jax.random.split(key)
    ratio = jax.random.uniform(k1, (b, 1)) * max_dropout_ratio
    drop = jax.random.uniform(k2, (b, n)) <= ratio  # [B,N]
    first = batch[:, :1, :]
    return jnp.where(drop[..., None], first, batch)


def shuffle_points(key, batch):
    """Random permutation of the point axis — ONE permutation shared by
    the whole batch, exactly the lineage's provider.shuffle_points
    ("use the same shuffling idx for the entire batch"); the previous
    per-cloud variant contradicted its own lineage-parity claim
    (code-review r5)."""
    n = batch.shape[1]
    perm = jax.random.permutation(key, n)
    return batch[:, perm, :]


def pc_normalize(batch):
    """Center each cloud's xyz to its centroid and scale to the unit sphere."""
    xyz = batch[..., :3]
    centroid = jnp.mean(xyz, axis=-2, keepdims=True)
    xyz = xyz - centroid
    m = jnp.max(jnp.linalg.norm(xyz, axis=-1, keepdims=True), axis=-2,
                keepdims=True)
    return jnp.concatenate([xyz / m, batch[..., 3:]], axis=-1)


# ------------------------------------------------- calib-aware (fusion)

def rotate_point_cloud_z_with_calib(key, batch, R):
    """Z-rotation with extrinsics compensation for projective fusion
    models (VERDICT r4 item 4): cam-space coords are invariant because
    R' @ (rot @ x) = (R @ rotᵀ) @ rot @ x = R @ x, so the point→pixel
    projection and the sampled pixel features don't move — only the
    point trunk sees a different pose (same math as the fusion-cls vote
    step).  Rotates xyz channels 0:3 only, like rotate_point_cloud_z."""
    angle = jax.random.uniform(key, (batch.shape[0],)) * 2.0 * jnp.pi
    rot = _rot_z(angle)
    batch = _apply_rot(batch, rot, rotate_normals=False)
    hp = jax.lax.Precision.HIGHEST
    return batch, jnp.einsum("bij,bkj->bik", R, rot, precision=hp)


# --------------------------------------------------------------- pipelines

_CLS_TRAIN = ("random_point_dropout", "random_scale_point_cloud",
              "shift_point_cloud")
_PARTSEG_TRAIN = ("random_scale_point_cloud", "shift_point_cloud")
_SEMSEG_TRAIN = ("rotate_point_cloud_z",)

_REGISTRY = {
    "rotate_point_cloud": rotate_point_cloud,
    "rotate_point_cloud_z": rotate_point_cloud_z,
    "rotate_perturbation_point_cloud": rotate_perturbation_point_cloud,
    "jitter_point_cloud": jitter_point_cloud,
    "shift_point_cloud": shift_point_cloud,
    "random_scale_point_cloud": random_scale_point_cloud,
    "random_point_dropout": random_point_dropout,
    "shuffle_points": shuffle_points,
}

# augmentations that must co-transform the camera extrinsics; applied
# through augment_fusion_batch, never augment_batch
_CALIB_REGISTRY = {
    "rotate_point_cloud_z_with_calib": rotate_point_cloud_z_with_calib,
}

TASK_PIPELINES = {
    "classification": _CLS_TRAIN,
    "partseg": _PARTSEG_TRAIN,
    # late fusion: the image branch never sees point coordinates, so the
    # point-only cls pipeline is safe as-is (SURVEY.md §2.2)
    "fusion_cls": _CLS_TRAIN,
    "semseg": _SEMSEG_TRAIN,
    # projective fusion: the semseg rotation must compensate extrinsics
    "fusion_semseg": ("rotate_point_cloud_z_with_calib",),
}


def augment_batch(key, batch, names):
    """Apply a named augmentation sequence on device (jit-safe)."""
    for i, name in enumerate(names):
        if name in _CALIB_REGISTRY:
            raise ValueError(f"{name} needs calib: use augment_fusion_batch")
        batch = _REGISTRY[name](jax.random.fold_in(key, i), batch)
    return batch


def augment_fusion_batch(key, batch, R, names):
    """augment_batch for multimodal tasks: calib-aware entries also
    rewrite the extrinsics; returns (points, R)."""
    for i, name in enumerate(names):
        k = jax.random.fold_in(key, i)
        if name in _CALIB_REGISTRY:
            batch, R = _CALIB_REGISTRY[name](k, batch, R)
        else:
            batch = _REGISTRY[name](k, batch)
    return batch, R


# --------------------------------------------------------- numpy (host) twin

class host_np:
    """Numpy twins of the device augmentations (same math, numpy RNG).

    Used by host-side pipelines and to feed the torch oracle an identical
    augmentation family; RNG streams intentionally differ from the jax
    versions (different generators), so tests compare distributions and
    invariants, not draws.
    """

    @staticmethod
    def pc_normalize(pc: np.ndarray) -> np.ndarray:
        centroid = np.mean(pc[..., :3], axis=-2, keepdims=True)
        xyz = pc[..., :3] - centroid
        m = np.max(np.linalg.norm(xyz, axis=-1, keepdims=True), axis=-2,
                   keepdims=True)
        return np.concatenate([xyz / m, pc[..., 3:]], axis=-1)

    @staticmethod
    def rotate_point_cloud(batch, rng=None):
        rng = rng or np.random
        out = batch.copy()
        for k in range(batch.shape[0]):
            a = rng.uniform() * 2 * np.pi
            c, s = np.cos(a), np.sin(a)
            rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
            out[k, :, :3] = batch[k, :, :3] @ rot
        return out

    @staticmethod
    def jitter_point_cloud(batch, sigma=0.01, clip=0.05, rng=None):
        rng = rng or np.random
        noise = np.clip(sigma * rng.randn(*batch[..., :3].shape), -clip, clip)
        out = batch.copy()
        out[..., :3] += noise.astype(batch.dtype)
        return out

    @staticmethod
    def shift_point_cloud(batch, shift_range=0.1, rng=None):
        rng = rng or np.random
        shifts = rng.uniform(-shift_range, shift_range,
                             (batch.shape[0], 3)).astype(batch.dtype)
        out = batch.copy()
        out[..., :3] += shifts[:, None, :]
        return out

    @staticmethod
    def random_scale_point_cloud(batch, scale_low=0.8, scale_high=1.25,
                                 rng=None):
        rng = rng or np.random
        scales = rng.uniform(scale_low, scale_high,
                             batch.shape[0]).astype(batch.dtype)
        out = batch.copy()
        out[..., :3] *= scales[:, None, None]
        return out

    @staticmethod
    def random_point_dropout(batch, max_dropout_ratio=0.875, rng=None):
        rng = rng or np.random
        out = batch.copy()
        for b in range(batch.shape[0]):
            ratio = rng.uniform() * max_dropout_ratio
            drop = np.where(rng.uniform(size=batch.shape[1]) <= ratio)[0]
            if len(drop) > 0:
                out[b, drop, :] = out[b, 0, :]
        return out
