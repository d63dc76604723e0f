"""Golden block tests (SURVEY.md §4.2): fixed-seed SA/FP/STN outputs
pinned to recorded values — catches silent numeric regressions in the
block wiring, init scheme, or op semantics.  Goldens recorded on the CPU
backend with float32 matmul precision."""

import jax
import jax.numpy as jnp
import numpy as np

from mm3d_tpu.models.pointnet import STN
from mm3d_tpu.models.pointnet2 import FeaturePropagation, SetAbstraction


def _data():
    rng = np.random.RandomState(42)
    xyz = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 128, 8).astype(np.float32))
    f2 = jnp.asarray(rng.randn(2, 32, 12).astype(np.float32))
    return xyz, feats, f2


def test_sa_block_golden():
    xyz, feats, _ = _data()
    with jax.default_matmul_precision("float32"):
        sa = SetAbstraction(32, 0.5, 8, (16, 32))
        v = sa.init(jax.random.PRNGKey(7), xyz, feats, train=False)
        _, f = sa.apply(v, xyz, feats, train=False)
    np.testing.assert_allclose(float(f.mean()), 0.18495772778987885,
                               rtol=1e-4)
    np.testing.assert_allclose(float(f.std()), 0.3142906725406647, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(f[0, 0, :3]),
        [0.000998015282675624, 0.09664710611104965, 0.3706933856010437],
        rtol=1e-3, atol=1e-5)


def test_fp_block_golden():
    xyz, feats, f2 = _data()
    with jax.default_matmul_precision("float32"):
        fp = FeaturePropagation((16,))
        v = fp.init(jax.random.PRNGKey(8), xyz, xyz[:, :32], feats, f2,
                    train=False)
        o = fp.apply(v, xyz, xyz[:, :32], feats, f2, train=False)
    np.testing.assert_allclose(float(o.mean()), 0.36707693338394165,
                               rtol=1e-4)
    np.testing.assert_allclose(float(o.std()), 0.518302857875824, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(o[0, 0, :3]),
        [0.9071139693260193, 0.19341601431369781, 0.5680476427078247],
        rtol=1e-3, atol=1e-5)


def test_stn_starts_at_identity():
    xyz, _, _ = _data()
    stn = STN(k=3)
    v = stn.init(jax.random.PRNGKey(9), xyz, train=False)
    m = stn.apply(v, xyz, train=False)
    np.testing.assert_allclose(np.asarray(m),
                               np.broadcast_to(np.eye(3), (2, 3, 3)),
                               atol=1e-6)
