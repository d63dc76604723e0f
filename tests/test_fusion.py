"""Multimodal components: projection/bilinear sampling vs torch
grid_sample-style oracle expectations, image branch, fusion models,
fusion training smoke (configs 4-5)."""

import jax
import jax.numpy as jnp
import numpy as np

from mm3d_tpu.data import synthetic as syn
from mm3d_tpu.models import get_model
from _helpers import jit_init
from mm3d_tpu.models.image import ImageEncoder
from mm3d_tpu.ops import projection as proj


def test_project_points_matches_manual():
    rng = np.random.RandomState(0)
    xyz = rng.randn(2, 32, 3).astype(np.float32)
    K = np.stack([syn.default_intrinsics((64, 64))] * 2)
    Rs, ts = [], []
    for b in range(2):
        eye = 3.0 * np.array([np.cos(b), 0.4, np.sin(b)], np.float32)
        R, t = syn.look_at_extrinsics(eye)
        Rs.append(R); ts.append(t)
    R = np.stack(Rs); t = np.stack(ts)
    uv, depth = proj.project_points(
        jnp.asarray(xyz), jnp.asarray(K), jnp.asarray(R), jnp.asarray(t))
    # manual per-point check
    b, n = 1, 5
    cam = R[b] @ xyz[b, n] + t[b]
    assert abs(float(depth[b, n]) - cam[2]) < 1e-5
    assert abs(float(uv[b, n, 0]) - (K[b][0, 0] * cam[0] / cam[2] + K[b][0, 2])) < 1e-4


def test_bilinear_sample_exact_on_grid_points_and_zero_padding():
    feat = jnp.asarray(np.arange(2 * 4 * 5 * 3).reshape(2, 4, 5, 3).astype(np.float32))
    # integer coords hit exact texels
    uv = jnp.asarray(np.array([[[2.0, 1.0], [0.0, 0.0]]] * 2, np.float32))
    out = proj.bilinear_sample(feat, uv)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(feat[0, 1, 2]))
    np.testing.assert_allclose(np.asarray(out[1, 1]), np.asarray(feat[1, 0, 0]))
    # midpoint interpolates
    uv2 = jnp.asarray(np.array([[[0.5, 0.0]]] * 2, np.float32))
    out2 = proj.bilinear_sample(feat, uv2)
    want = 0.5 * (np.asarray(feat[0, 0, 0]) + np.asarray(feat[0, 0, 1]))
    np.testing.assert_allclose(np.asarray(out2[0, 0]), want)
    # far outside -> zeros
    uv3 = jnp.asarray(np.array([[[-10.0, 2.0], [100.0, 2.0]]] * 2, np.float32))
    out3 = proj.bilinear_sample(feat, uv3)
    np.testing.assert_array_equal(np.asarray(out3), 0.0)


def test_bilinear_matches_torch_grid_sample():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(3)
    feat = rng.randn(2, 6, 7, 4).astype(np.float32)
    uv = np.stack([rng.uniform(0, 6, (2, 50)), rng.uniform(0, 5, (2, 50))],
                  -1).astype(np.float32)
    got = np.asarray(proj.bilinear_sample(jnp.asarray(feat), jnp.asarray(uv)))
    # torch grid_sample with align_corners=True over pixel-center coords:
    # normalize u in [0, W-1] -> [-1, 1]
    H, W = 6, 7
    grid = np.stack([uv[..., 0] / (W - 1) * 2 - 1,
                     uv[..., 1] / (H - 1) * 2 - 1], -1)
    t = F.grid_sample(
        torch.from_numpy(feat).permute(0, 3, 1, 2),
        torch.from_numpy(grid).unsqueeze(2),  # [B,N,1,2]
        mode="bilinear", padding_mode="zeros", align_corners=True)
    want = t[:, :, :, 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_image_encoder_shapes():
    m = ImageEncoder()
    img = jnp.zeros((2, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), img, train=True)
    fmap, glob = m.apply(v, img, train=False)
    assert fmap.shape == (2, 16, 16, 128)
    assert glob.shape == (2, 512)


def test_fusion_cls_forward_and_attention():
    for name in ("fusion_cls", "fusion_cls_attention"):
        spec = get_model(name)
        m = spec.builder(num_class=4)
        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
        img = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
        K = jnp.asarray(np.stack([syn.default_intrinsics((32, 32))] * 2))
        R = jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * 2))
        t = jnp.asarray(np.array([[0, 0, 3.0]] * 2, np.float32))
        v = jit_init(m, {"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                     pts, img, K, R, t, train=True)
        logp, aux = jax.jit(lambda v: m.apply(
            v, pts, img, K, R, t, train=False))(v)
        assert logp.shape == (2, 4)
        np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0,
                                   rtol=1e-4)
        if name.endswith("attention"):
            assert "fusion_alpha" in aux


def test_fusion_semseg_forward():
    spec = get_model("fusion_sem_seg")
    m = spec.builder(num_class=13)
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(2, 256, 9).astype(np.float32))
    img = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    K = jnp.asarray(np.stack([syn.default_intrinsics((32, 32))] * 2))
    R = jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * 2))
    t = jnp.asarray(np.array([[0, 0, 3.0]] * 2, np.float32))
    v = jit_init(m, {"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)},
                 pts, img, K, R, t, train=True)
    logp, aux = jax.jit(lambda v: m.apply(
        v, pts, img, K, R, t, train=False))(v)
    assert logp.shape == (2, 256, 13)
    assert aux["proj_valid"].shape == (2, 256)


def test_fusion_train_smoke(tmp_path):
    # augmentations default (None) -> the new fusion_cls pipeline
    # (dropout/scale/shift, VERDICT r4 item 4) runs inside the step
    from mm3d_tpu.training.loop import TrainConfig, Trainer
    cfg = TrainConfig(model="fusion_cls", epochs=1, batch_size=4, npoint=64,
                      train_size=8, test_size=4, num_class=4,
                      image_hw=(32, 32), log_dir=str(tmp_path),
                      checkpoint=False, log_every=1)
    tr = Trainer(cfg)
    result = tr.fit()
    assert "instance_acc" in result and np.isfinite(result["eval_loss"])


def test_fusion_semseg_train_smoke(tmp_path):
    # augmentations default -> the calib-compensated Z-rotation pipeline
    from mm3d_tpu.training.loop import TrainConfig, Trainer
    cfg = TrainConfig(model="fusion_sem_seg", epochs=1, batch_size=2,
                      npoint=128, train_size=4, test_size=2,
                      image_hw=(32, 32), log_dir=str(tmp_path),
                      checkpoint=False, log_every=1)
    tr = Trainer(cfg)
    result = tr.fit()
    assert "miou" in result and np.isfinite(result["eval_loss"])


def test_calib_rotation_leaves_projection_invariant():
    """rotate_point_cloud_z_with_calib: (x, R) -> (rot·x, R·rotᵀ) keeps
    cam-space coordinates bit-stable up to fp rounding, so the sampled
    pixel features and the validity mask don't move (VERDICT r4 item 4:
    'projection validity mask statistics unchanged — test it')."""
    from mm3d_tpu.data import augment as aug
    from mm3d_tpu.ops import projection as proj
    rng = np.random.RandomState(3)
    B, N, HW = 3, 256, 32
    pts = jnp.asarray(rng.randn(B, N, 9).astype(np.float32))
    fmap = jnp.asarray(rng.rand(B, HW // 4, HW // 4, 8).astype(np.float32))
    K = jnp.asarray(np.stack([syn.default_intrinsics((HW, HW))] * B))
    R = jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * B))
    t = jnp.asarray(np.array([[0, 0, 3.0]] * B, np.float32))
    pix0, val0 = proj.sample_image_features(fmap, pts[..., :3], K, R, t,
                                            (HW, HW), stride=4)
    pts2, R2 = aug.rotate_point_cloud_z_with_calib(
        jax.random.PRNGKey(5), pts, R)
    # non-xyz channels untouched
    np.testing.assert_array_equal(np.asarray(pts2[..., 3:]),
                                  np.asarray(pts[..., 3:]))
    pix1, val1 = proj.sample_image_features(fmap, pts2[..., :3], K, R2, t,
                                            (HW, HW), stride=4)
    np.testing.assert_array_equal(np.asarray(val0), np.asarray(val1))
    np.testing.assert_allclose(np.asarray(pix0), np.asarray(pix1),
                               rtol=1e-4, atol=1e-4)
