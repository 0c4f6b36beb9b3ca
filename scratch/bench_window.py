"""End-to-end step bench: window path vs current pallas path, 32k level-16."""
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

WINDOW = sys.argv[1] == "window" if len(sys.argv) > 1 else True
N_STEPS = 200

m = make_mtp(16, species_count=1, seed=0)
model = MTPModel.from_data(m, dtype=jnp.float32)
pos, types, cell = make_lattice("fcc", 4.0, (20, 20, 20))
n = len(pos)
state = init_state(pos, types, np.full(n, 58.693), cell, dtype=jnp.float32)
state = thermalize(jax.random.PRNGKey(0), state, 300.0)

import os
J = int(os.environ.get("BW_J", 56))
GB = os.environ.get("BW_GB", "0") == "1"
sim = Simulation(
    model, max_neighbors=J, skin=0.6, steps_per_rebuild=30,
    compute_virial=False, window=WINDOW, giveback=GB,
)

def run(state):
    state, _, overflow = sim.run_async(state, N_STEPS, ensemble="nve", dt=0.001)
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
    print(f"rep {rep}: {dt*1e3/N_STEPS:.3f} ms/step, {n*N_STEPS/dt:,.0f} atom-steps/s")
    assert not bool(overflow)
print(f"window={WINDOW} J={J} gb={GB} BEST: {best*1e3/N_STEPS:.3f} ms/step, {n*N_STEPS/best:,.0f} atom-steps/s")
