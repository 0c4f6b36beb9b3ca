"""Window-path throughput vs system size (160k, 1M)."""
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

reps = {"160k": (20, 20, 100), "1m": (63, 63, 63)}[sys.argv[1]]
# 1M: the max-degree tail over 30x more atoms exceeds J=56 once thermal
# disorder develops (measured); 64 holds
J = 64
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 60

m = make_mtp(16, species_count=1, seed=0)
model = MTPModel.from_data(m, dtype=jnp.float32)
pos, types, cell = make_lattice("fcc", 4.0, reps)
n = len(pos)
print(f"N = {n}")
state = init_state(pos, types, np.full(n, 58.693), cell, dtype=jnp.float32)
state = thermalize(jax.random.PRNGKey(0), state, 300.0)

sim = Simulation(model, max_neighbors=J, skin=0.6, steps_per_rebuild=30,
                 compute_virial=False, window=True)

# equilibrate through the thermalization transient with short rebuild
# intervals (the first ~30 post-thermalize steps have a fatter max-
# displacement tail that trips the Verlet staleness flag at spb=30)
eq = Simulation(model, max_neighbors=J, skin=0.6, steps_per_rebuild=10,
                compute_virial=False, window=True)
state, _, ovf = eq.run_async(state, 60, ensemble="nve", dt=0.001)
assert not bool(ovf), "equilibration overflow"

def run(state):
    state, _, overflow = sim.run_async(state, n_steps, ensemble="nve", dt=0.001)
    return state, overflow

state, overflow = run(state)
float(jnp.sum(state.positions))
assert not bool(overflow), "overflow"
best = 1e9
for rep in range(3):
    t0 = time.perf_counter()
    state, overflow = run(state)
    float(jnp.sum(state.positions))
    dt = time.perf_counter() - t0
    best = min(best, dt)
    print(f"rep {rep}: {dt*1e3/n_steps:.3f} ms/step, {n*n_steps/dt:,.0f} atom-steps/s, ovf {bool(overflow)}")
print(f"{sys.argv[1]} BEST: {n*n_steps/best:,.0f} atom-steps/s")
