"""Flat row-gather cost vs table size: does ns/row degrade at 9M rows?"""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

for n_rows in [1_792_000, 8_972_800]:
    key = jax.random.PRNGKey(0)
    perm = np.random.default_rng(0).permutation(n_rows).astype(np.int32)
    perm = jnp.asarray(perm)

    @jax.jit
    def run(x):
        # produce the table in-program (like the step graph does), then gather
        t = x * 1.000001 + 0.5
        g = jnp.take(t, perm, axis=0)
        return jnp.sum(g)

    x = jax.random.normal(key, (n_rows, 8), jnp.float32)
    float(run(x))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    print(f"{n_rows} rows x 32B: {best*1e3:.2f} ms = {best/n_rows*1e9:.2f} ns/row")
