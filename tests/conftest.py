"""Test harness config.

Default test runs use the CPU backend with 8 virtual devices so that
(a) results are deterministic and independent of TPU availability, and
(b) the shard_map/pjit data-parallel path is exercised on a fake mesh
(SURVEY.md §4.4).  Set MM3D_TEST_TPU=1 to run the suite on the real chip
instead (used by scripts/run_tpu_tests.sh).

Must run before jax initializes — keep this at import time, first.
"""

import os
import sys

if not os.environ.get("MM3D_TEST_TPU"):
    # Hard override: the host's sitecustomize force-registers the axon TPU
    # backend regardless of JAX_PLATFORMS, so the env var alone is not
    # enough — jax.config.update below is what actually pins CPU.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()

    # persistent compile cache: the suite is compile-bound on this
    # 1-core host; warm runs are several times faster. (Inlined rather
    # than importing mm3d_tpu — sys.path isn't set up yet here.)
    _cache_dir = os.path.expanduser("~/.cache/mm3d_jax_cache_cpu")
    os.makedirs(_cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def pytest_addoption(parser):
    parser.addoption("--slow", action="store_true", default=False,
                     help="also run tests marked slow (documented "
                          "negative-result kernels, heavy smokes)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy test, excluded from the default suite "
                   "(run with --slow)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    import pytest as _pytest
    skip = _pytest.mark.skip(reason="slow (run with --slow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
