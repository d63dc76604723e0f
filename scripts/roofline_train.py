#!/usr/bin/env python
"""Close VERDICT r3 item 3: is the unfused train step at the HBM
materialization floor?

Method (all chain-slope timed, tunnel-safe):
1. Measure ACHIEVABLE HBM streaming bandwidth with a big elementwise
   chain (3 array passes per step — see the accounting note inline).
2. Time the SA1 block alone: eval fwd, train fwd (BN batch stats), and
   train fwd+bwd.
3. Convert each time to "equivalent passes over the grouped [B,S,K,C]
   tensors" at the measured bandwidth and compare against the semantic
   minimum pass count for exact global-batch BN:
     fwd:  per BN layer ~3 (materialize h, stats reduce, normalize+
           consume) -> 3 layers = 9 grouped passes (C-weighted)
     bwd:  per BN layer ~3 reads of saved pre-BN + dy traffic -> ~2x fwd
   The fused streaming alternative was measured FLOP-bound-slower (r2)
   and the slab-select retrofit rejected by arithmetic (BASELINE r4),
   so if the implied pass count is near the minimum, the floor is real.

Run on chip:  python scripts/roofline_train.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mm3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from mm3d_tpu.utils.profiling import chain_time

if os.environ.get("MM3D_ROOFLINE_SMOKE"):  # CPU plumbing check
    B, N, S, K = 2, 128, 32, 8
    MLP = (16, 16, 32)
    BIGROWS = 1024
else:
    B, N, S, K = 64, 1024, 512, 32
    MLP = (64, 64, 128)
    BIGROWS = 1024 * 1024


def med(fn, x, reps=3, k1=3, k2=13):
    return np.median([chain_time(fn, x, k1=k1, k2=k2)
                      for _ in range(reps)]) * 1e3


def main():
    r = np.random.RandomState(0)

    # 1. achievable HBM bandwidth: elementwise on 256 MB (read+write)
    big = jnp.asarray(r.randn(64, BIGROWS).astype(np.float32))

    @jax.jit
    def stream(x):
        return x * 1.000001 + 1e-9

    t_ms = med(stream, big)
    # chain_time folds p + eps*mean(fn(p)) per iteration: the stream
    # fuses into the mean's read (no intermediate write), then the
    # carry update reads p again and writes it — 2 reads + 1 write
    # = 3 array passes per iteration, NOT 2 (code-review r4 finding:
    # the 2-pass figure deflated GB/s and the implied pass counts ~1.5x)
    bytes_per_pass = 3 * big.size * 4
    gbs = bytes_per_pass / (t_ms * 1e-3) / 1e9
    print(f"streaming probe: {t_ms:.3f} ms for {bytes_per_pass/1e9:.2f} GB"
          f" -> {gbs:.0f} GB/s achievable", flush=True)

    # 2. SA1 block in isolation (fp32, jax impl = the train path)
    from mm3d_tpu import ops
    from mm3d_tpu.models.pointnet2 import SetAbstraction

    xyz = jnp.asarray(r.randn(B, N, 3).astype(np.float32))
    sa = SetAbstraction(S, 0.2, K, MLP)
    with ops.use_impl("jax"):
        v = sa.init(jax.random.PRNGKey(0), xyz, None, train=True)

        @jax.jit
        def fwd_eval(x):
            nx, out = sa.apply(v, x, None, train=False)
            return x + 1e-6 * out.mean() + 0.0 * nx.mean()

        @jax.jit
        def fwd_train(x):
            (nx, out), _ = sa.apply(v, x, None, train=True,
                                    mutable=["batch_stats"])
            return x + 1e-6 * out.mean() + 0.0 * nx.mean()

        @jax.jit
        def fwd_bwd(x):
            def loss(params, x):
                (nx, out), _ = sa.apply(
                    {**v, "params": params}, x, None, train=True,
                    mutable=["batch_stats"])
                return out.mean() + 0.0 * nx.mean()
            l, g = jax.value_and_grad(loss)(v["params"], x)
            # keep EVERY grad leaf alive: with only the first leaf in the
            # carry, XLA dead-codes the weight-grad contractions for the
            # other layers and the measured bwd undercounts (ADVICE r4)
            s = sum(jnp.mean(t) for t in jax.tree_util.tree_leaves(g))
            return x + 1e-6 * l + 1e-9 * s

        te = med(fwd_eval, xyz)
        tf = med(fwd_train, xyz)
        tb = med(fwd_bwd, xyz)
    print(f"SA1 eval fwd {te:.2f} ms, train fwd {tf:.2f} ms "
          f"(BN-stats delta {tf - te:.2f}), fwd+bwd {tb:.2f} ms",
          flush=True)

    # 3. implied grouped-tensor passes at measured bandwidth
    grouped_bytes = (B * S * K * (MLP[0] + MLP[1]) + B * S * K * MLP[2]) * 4
    # C-weighted "one pass" = touching h1+h2+h3 once each
    one_pass = (B * S * K * (MLP[0] + MLP[1] + MLP[2])) * 4
    for name, t in (("fwd", tf), ("fwd+bwd", tb)):
        moved = gbs * 1e9 * t * 1e-3
        print(f"{name}: implied {moved/1e9:.2f} GB = "
              f"{moved/one_pass:.1f} passes over h1+h2+h3 "
              f"(semantic min: fwd ~3, fwd+bwd ~9)", flush=True)
    _ = grouped_bytes


if __name__ == "__main__":
    main()
