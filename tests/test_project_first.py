"""project_first SA reformulation is numerically equivalent to the
canonical group-then-MLP path (same params, same outputs to fp32
reassociation tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np

from mm3d_tpu.models.pointnet2 import SetAbstraction, SetAbstractionMsg


def _transfer_plain_to_proj(plain_vars):
    """Map plain-path params (mlp/dense_i, bn_i) to project-first names."""
    p = plain_vars["params"]["mlp"]
    s = plain_vars["batch_stats"]["mlp"]
    n = len([k for k in p if k.startswith("dense_")])
    params = {"proj_kernel": p["dense_0"]["kernel"],
              "proj_bias": p["dense_0"]["bias"],
              "proj_bn": p["bn_0"]}
    stats = {"proj_bn": s["bn_0"]}
    if n > 1:
        params["mlp_rest"] = {}
        stats["mlp_rest"] = {}
        for i in range(1, n):
            params["mlp_rest"][f"dense_{i-1}"] = p[f"dense_{i}"]
            params["mlp_rest"][f"bn_{i-1}"] = p[f"bn_{i}"]
            stats["mlp_rest"][f"bn_{i-1}"] = s[f"bn_{i}"]
    return {"params": params, "batch_stats": stats}


def test_ssg_project_first_equivalent():
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 256, 16).astype(np.float32))

    plain = SetAbstraction(64, 0.4, 16, (32, 32, 64), project_first=False)
    proj = SetAbstraction(64, 0.4, 16, (32, 32, 64), project_first=True)
    with jax.default_matmul_precision("float32"):
        pv = plain.init(jax.random.PRNGKey(0), xyz, feats, train=False)
        qv = _transfer_plain_to_proj(pv)
        nx1, f1 = plain.apply(pv, xyz, feats, train=False)
        nx2, f2 = proj.apply(qv, xyz, feats, train=False)
    np.testing.assert_array_equal(np.asarray(nx1), np.asarray(nx2))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-4, atol=1e-4)


def test_fp_project_first_equivalent():
    from mm3d_tpu.models.pointnet2 import FeaturePropagation
    rng = np.random.RandomState(2)
    xyz1 = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    xyz2 = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32))
    f1 = jnp.asarray(rng.randn(2, 128, 24).astype(np.float32))
    f2 = jnp.asarray(rng.randn(2, 32, 48).astype(np.float32))

    plain = FeaturePropagation((64, 32), project_first=False)
    proj = FeaturePropagation((64, 32), project_first=True)
    with jax.default_matmul_precision("float32"):
        pv = plain.init(jax.random.PRNGKey(0), xyz1, xyz2, f1, f2,
                        train=False)
        qv = _transfer_plain_to_proj(pv)
        o1 = plain.apply(pv, xyz1, xyz2, f1, f2, train=False)
        o2 = proj.apply(qv, xyz1, xyz2, f1, f2, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-4, atol=1e-4)
    # M == 1 broadcast path
    with jax.default_matmul_precision("float32"):
        pv1 = plain.init(jax.random.PRNGKey(1), xyz1, xyz2[:, :1], f1,
                         f2[:, :1], train=False)
        qv1 = _transfer_plain_to_proj(pv1)
        a = plain.apply(pv1, xyz1, xyz2[:, :1], f1, f2[:, :1], train=False)
        b = proj.apply(qv1, xyz1, xyz2[:, :1], f1, f2[:, :1], train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


def test_msg_project_first_forward():
    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32))
    msg = SetAbstractionMsg(64, (0.2, 0.4), (8, 16),
                            ((16, 32), (16, 32)))
    v = msg.init(jax.random.PRNGKey(0), xyz, None, train=True)
    nx, f = msg.apply(v, xyz, None, train=False)
    assert nx.shape == (2, 64, 3) and f.shape == (2, 64, 64)
    assert bool(jnp.isfinite(f).all())
