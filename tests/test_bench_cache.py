"""bench.py's persistent-compile-cache setup (repo-local .xla_bench_cache).

The cache exists so bench reruns — including the driver's end-of-round
run — skip the ~20 min of 448px compiles through the TPU tunnel and
always reach all eight points within their timeout.  These tests pin the
setup contract, not XLA's cache behavior (jax owns that): the config
keys are set to the repo-local dir, and BENCH_NO_CACHE opts out.
"""

import importlib
import os

import jax


def _fresh_bench():
    import bench
    return importlib.reload(bench)


def test_setup_points_jax_at_repo_local_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("BENCH_NO_CACHE", raising=False)
    bench = _fresh_bench()
    prev = jax.config.jax_compilation_cache_dir
    try:
        bench._setup_compilation_cache()
        cache_dir = jax.config.jax_compilation_cache_dir
        assert cache_dir is not None
        assert os.path.basename(cache_dir) == ".xla_bench_cache"
        assert os.path.dirname(cache_dir) == os.path.dirname(
            os.path.abspath(bench.__file__))
        assert os.path.isdir(cache_dir)
        # thresholds opened so even sub-second compiles persist
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.0
        assert jax.config.jax_persistent_cache_min_entry_size_bytes == -1
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_no_cache_env_opts_out(monkeypatch):
    monkeypatch.setenv("BENCH_NO_CACHE", "1")
    bench = _fresh_bench()
    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        bench._setup_compilation_cache()
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
