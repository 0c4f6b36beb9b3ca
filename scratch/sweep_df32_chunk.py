"""df32 eval cost vs atom-chunk size at the 32k bench config (v5e).

energy_and_pair_forces_df lax.maps over (chunk)-row blocks; each map step
pays dispatch-free but sequential latency, and each chunk's (chunk, J, B)
df intermediates trade HBM traffic for loop count. Sweep the knob.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from mtp_tpu.io.basis_gen import make_mtp
from mtp_tpu.md.simulation import make_lattice
from mtp_tpu.models.mtp import MTPModel, gather_displacements_df
from mtp_tpu.ops.moments_df import energy_and_pair_forces_df
from mtp_tpu.ops.neighbors import build_neighbor_list, grid_shape

m = make_mtp(16, species_count=1, seed=0)
model = MTPModel.from_data(m, dtype=jnp.float32)
pos, types, cell = make_lattice("fcc", 4.0, (20, 20, 20))
rng = np.random.default_rng(0)
pos = (pos + rng.normal(scale=0.07, size=pos.shape)).astype(np.float32)
cell32 = jnp.asarray(np.asarray(cell, np.float32))
pos32 = jnp.asarray(pos)
n = len(pos)
nl = build_neighbor_list(pos32, cell32, model.cutoff, max_neighbors=64,
                         grid=grid_shape(cell, model.cutoff), with_reverse=True)
assert not bool(nl.overflow)
types_j = jnp.asarray(types, jnp.int32)
jtypes = types_j[nl.idx]
mask = nl.idx != jnp.arange(n, dtype=nl.idx.dtype)[:, None]

for chunk in (128, 256, 512, 1024):
    def one(x, i):
        hi, lo = gather_displacements_df(x + i * jnp.float32(1e-30), nl.idx,
                                         cell32, jnp.linalg.inv(cell32))
        se, t = energy_and_pair_forces_df(
            model.schedule, model.coeffs, hi, mask, types_j, jtypes,
            disp_lo=lo, chunk=chunk,
        )
        return x, t[0, 0, 0] + se[0]

    @jax.jit
    def loop(x):
        _, ys = jax.lax.scan(one, x, jnp.arange(3, dtype=jnp.float32))
        return ys.sum()

    t0 = time.time()
    float(loop(pos32))
    t_compile = time.time() - t0
    t0 = time.time()
    float(loop(pos32))
    dt = (time.time() - t0) / 3 * 1e3
    print(f"chunk {chunk:5d}: {dt:7.1f} ms/eval (compile+1st {t_compile:.0f} s)",
          flush=True)
