"""Step decomposition at a given size: rebuild vs scan, window on/off."""
import sys
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

reps = {"32k": (20, 20, 20), "160k": (20, 20, 100)}[sys.argv[1]]
window = sys.argv[2] == "window" if len(sys.argv) > 2 else True

m = make_mtp(16, species_count=1, seed=0)
model = MTPModel.from_data(m, dtype=jnp.float32)
pos, types, cell = make_lattice("fcc", 4.0, reps)
n = len(pos)
print(f"N={n} window={window}")
state = init_state(pos, types, np.full(n, 58.693), cell, dtype=jnp.float32)
state = thermalize(jax.random.PRNGKey(0), state, 300.0)
sim = Simulation(model, max_neighbors=56, skin=0.6, steps_per_rebuild=10,
                 compute_virial=False, window=window)
grid = grid_shape(cell, model.cutoff + 0.6)
state, _, ovf = sim.run_async(state, 30, ensemble="nve", dt=0.001)
float(jnp.sum(state.positions)); assert not bool(ovf)

nl = sim.rebuild(state, grid=grid, max_neighbors=56)
jax.block_until_ready(nl.idx)

def timeit(label, fn, reps_n=4):
    fn()
    best = 1e9
    for _ in range(reps_n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.2f} ms")
    return best

timeit("rebuild", lambda: float(jnp.sum(sim.rebuild(state, grid=grid, max_neighbors=56).idx)))
def scan30():
    s2, _, _ = sim.steps(state, 0, nl, n_steps=30, ensemble="nve")
    return float(jnp.sum(s2.positions))
t = timeit("30-step scan", scan30)
print(f"  -> {t/30*1e3:.2f} ms/step")
