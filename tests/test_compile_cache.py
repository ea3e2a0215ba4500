"""Persistent XLA compilation cache knob (utils.enable_compile_cache,
config tpu.compile_cache_dir, CLI --compile_cache_dir). The production
train step compiles in minutes cold; the cache makes restarts and repeat
CLI invocations reuse the executable."""

import os

import jax
import jax.numpy as jnp

from encodec_pytorch_tpu.utils import enable_compile_cache


def test_compile_cache_populates(tmp_path):
    cache = tmp_path / 'xla_cache'
    enable_compile_cache(cache)
    try:
        @jax.jit
        def f(x):
            return jnp.tanh(x @ x.T).sum()

        f(jnp.ones((64, 64))).block_until_ready()
        entries = os.listdir(cache)
        assert entries, 'compilation cache directory stayed empty'
    finally:
        jax.config.update('jax_compilation_cache_dir', None)
        # the config flag alone doesn't retire the initialized cache
        # SINGLETON: without this reset every later compile in the pytest
        # session keeps writing executables into this (pytest-temporary)
        # directory — observed as a segfault inside
        # compilation_cache.put_executable_and_time's zstd write several
        # hundred tests later
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()


def test_enable_compile_cache_noop_on_empty():
    before = jax.config.jax_compilation_cache_dir
    enable_compile_cache('')
    enable_compile_cache(None)
    assert jax.config.jax_compilation_cache_dir == before
