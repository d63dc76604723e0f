"""Point-axis-sharded FPS == single-device FPS (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from mm3d_tpu.ops.geometry import _fps_jax
from mm3d_tpu.parallel import make_mesh
from mm3d_tpu.parallel.sharded_fps import sharded_fps


def test_sharded_fps_matches_single_device():
    mesh = make_mesh(jax.devices()[:8], data_parallel=8)
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(2, 1024, 3).astype(np.float32))
    got = np.asarray(jax.jit(
        lambda p: sharded_fps(p, 128, mesh))(xyz))
    want = np.asarray(_fps_jax(xyz, 128))
    np.testing.assert_array_equal(got, want)


def test_sharded_fps_odd_batch_and_small_tiles():
    mesh = make_mesh(jax.devices()[:4], data_parallel=4)
    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.randn(3, 64, 3).astype(np.float32))
    got = np.asarray(sharded_fps(xyz, 16, mesh))
    want = np.asarray(_fps_jax(xyz, 16))
    np.testing.assert_array_equal(got, want)
