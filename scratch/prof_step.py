"""Decompose the step cost: rebuild dispatch vs step-scan dispatch, and the
step-scan with the t_ji give-back disabled (perf probe, wrong physics)."""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from mtp_tpu.io.basis_gen import make_mtp
from mtp_tpu.md.simulation import Simulation, make_lattice
from mtp_tpu.md.state import init_state, thermalize
from mtp_tpu.models.mtp import MTPModel
from mtp_tpu.ops.neighbors import grid_shape

m = make_mtp(16, species_count=1, seed=0)
model = MTPModel.from_data(m, dtype=jnp.float32)
pos, types, cell = make_lattice("fcc", 4.0, (20, 20, 20))
n = len(pos)
state = init_state(pos, types, np.full(n, 58.693), cell, dtype=jnp.float32)
state = thermalize(jax.random.PRNGKey(0), state, 300.0)

sim = Simulation(model, max_neighbors=56, skin=0.6, steps_per_rebuild=30,
                 compute_virial=False, window=True)
grid = grid_shape(cell, model.cutoff + 0.6)

# equilibrate a bit + warm the caches
state, _, ovf = sim.run_async(state, 60, ensemble="nve", dt=0.001)
float(jnp.sum(state.positions))
assert not bool(ovf)

nl = sim.rebuild(state, grid=grid, max_neighbors=56)
jax.block_until_ready(nl.idx)

def timeit(label, fn, reps=5):
    fn()  # warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.2f} ms")
    return best

# rebuild dispatch (host-sync'd each call — includes ~10-30 ms tunnel noise,
# but relative changes still show)
timeit("rebuild (sorted+bands+mirror)", lambda: float(jnp.sum(
    sim.rebuild(state, grid=grid, max_neighbors=56).idx)))

# 30-step scan
aux = 0
def scan30():
    s2, _, stale = sim.steps(state, aux, nl, n_steps=30, ensemble="nve")
    return float(jnp.sum(s2.positions))
t = timeit("30-step scan (full)", scan30)
print(f"  -> {t/30*1e3:.2f} ms/step")
