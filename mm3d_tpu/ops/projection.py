"""Point->pixel projection + bilinear feature sampling (L0, multimodal).

The lineage lifts 2D-CNN features onto points by projecting each 3D point
through the camera (K·[R|t]) and bilinearly sampling the image feature
map (`F.grid_sample`-style; SURVEY.md §2.1 last row, BASELINE.json:5
"fused point→pixel projection + bilinear-sampling kernel").

Pure-JAX implementation here (XLA fuses the 4-corner gather + lerp into
one stage); the Pallas fused kernel registers behind the same API via
`dispatch`.  Semantics: zero padding outside the image (out-of-range
corner contributions vanish), pixel-center convention u∈[0, W-1].
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mm3d_tpu.ops import dispatch


def project_points(xyz: jax.Array, K: jax.Array, R: jax.Array,
                   t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Project world points into pixel coordinates.

    Args:
      xyz: [B, N, 3] world coordinates.
      K:   [B, 3, 3] intrinsics.
      R:   [B, 3, 3] world->camera rotation.
      t:   [B, 3] world->camera translation.
    Returns:
      (uv [B, N, 2] pixel coords, depth [B, N] camera-frame z).
    """
    hp = jax.lax.Precision.HIGHEST
    cam = jnp.einsum("bij,bnj->bni", R, xyz, precision=hp) + t[:, None, :]
    z = cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = K[:, None, 0, 0] * cam[..., 0] / safe_z + K[:, None, 0, 2]
    v = K[:, None, 1, 1] * cam[..., 1] / safe_z + K[:, None, 1, 2]
    return jnp.stack([u, v], axis=-1), z


def _bilinear_sample_jax(feat: jax.Array, uv: jax.Array) -> jax.Array:
    """feat [B,H,W,C], uv [B,N,2] pixel coords -> [B,N,C], zero-padded."""
    B, H, W, C = feat.shape
    u, v = uv[..., 0], uv[..., 1]
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    du = (u - x0)[..., None]
    dv = (v - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = feat.reshape(B, H * W, C)

    def corner(xi, yi):
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * inside[..., None].astype(feat.dtype)

    c00 = corner(x0i, y0i)
    c10 = corner(x0i + 1, y0i)
    c01 = corner(x0i, y0i + 1)
    c11 = corner(x0i + 1, y0i + 1)
    top = c00 * (1 - du) + c10 * du
    bot = c01 * (1 - du) + c11 * du
    return top * (1 - dv) + bot * dv


def bilinear_sample(feat: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear sampling of a feature map at fractional pixel coords."""
    fn = dispatch.resolve("bilinear_sample", _bilinear_sample_jax)
    return fn(feat, uv)


def sample_image_features(feat: jax.Array, xyz: jax.Array, K: jax.Array,
                          R: jax.Array, t: jax.Array,
                          image_hw: Tuple[int, int],
                          stride: int = 1) -> Tuple[jax.Array, jax.Array]:
    """Project points and sample per-point pixel features in one call.

    `feat` may be a downsampled map (stride > 1 relative to the image the
    intrinsics describe); uv is scaled accordingly.  Returns
    (pixel_feats [B,N,C], valid [B,N] mask: in front of camera & in frame).

    Convention note (deliberate, pinned by the grid_sample-oracle
    parity test): map coords are uv/stride, NOT the align_corners
    rescale (Wf-1)/(W-1) — so at stride>1 a point within ~stride px of
    the right/bottom image edge is `valid` but bilinear zero-padding
    attenuates its feature (up to 4x at the extreme corner).  Both
    fusion models TRAIN with this convention, so it is part of the
    checkpoint contract; changing it invalidates trained weights.
    """
    uv, depth = project_points(xyz, K, R, t)
    H, W = image_hw
    valid = ((depth > 0) & (uv[..., 0] >= 0) & (uv[..., 0] <= W - 1)
             & (uv[..., 1] >= 0) & (uv[..., 1] <= H - 1))
    sampled = bilinear_sample(feat, uv / float(stride))
    return sampled * valid[..., None].astype(feat.dtype), valid
