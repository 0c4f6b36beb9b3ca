"""Round-4 item 1: where does the 1M-atom time go?

Times (a) the steps scan per-step, (b) the full rebuild, (c) rebuild stage
decomposition. At 1M scale every dispatch is >>30 ms so the tunnel floor is
noise. Usage: python scratch/prof_1m_r4.py [32k|160k|1m]
"""
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
from mtp_tpu.ops.neighbors import (
    build_neighbor_list,
    build_sorted_neighbor_list,
    grid_shape,
)
from mtp_tpu.ops.slot_assign import assign_slots_apply, octant_classes_T, reverse_slots
from mtp_tpu.ops.window_disp import num_tiles, pad_window_lists, window_disp, worklists
from mtp_tpu.ops.window_giveback import giveback_metadata

which = sys.argv[1] if len(sys.argv) > 1 else "1m"
reps = {"32k": (20, 20, 20), "160k": (40, 40, 25), "1m": (63, 63, 63)}[which]
J = 64 if which != "32k" else 56

m = make_mtp(16, species_count=1, seed=0)
model = MTPModel.from_data(m, dtype=jnp.float32)
pos, types, cell = make_lattice("fcc", 4.0, reps)
n = len(pos)
state = thermalize(
    jax.random.PRNGKey(0),
    init_state(pos, types, np.full(n, 58.693), cell, dtype=jnp.float32),
    300.0,
)
sim = Simulation(model, max_neighbors=J, skin=0.6, steps_per_rebuild=30,
                 compute_virial=False, giveback=(which != "32k"))
grid = grid_shape(cell, (model.cutoff + 0.6))
print(f"N={n} J={J} grid={grid} giveback={sim._use_giveback(grid, n)}")

# equilibrate
eq = Simulation(model, max_neighbors=J, skin=0.6, steps_per_rebuild=10,
                compute_virial=False, giveback=(which != "32k"))
state, _, fl = eq.run_async(state, 30, ensemble="nve", dt=0.001)
float(jnp.sum(state.positions))
assert not bool(fl), fl


def timeit(label, fn, reps_n=3):
    out = fn()
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps_n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.2f} ms")
    return out, best


nl, t_rebuild = timeit(
    "rebuild (full)", lambda: sim.rebuild(state, grid=grid, max_neighbors=J))
state2 = sim.refresh_forces(state, nl)
jax.block_until_ready(state2.positions)

NS = 30
def steps():
    s, a, stale = sim.steps(state2, 0, nl, n_steps=NS, dt=0.001)
    return s.positions

_, t_steps = timeit(f"steps({NS})", steps)
per_step = t_steps / NS
amort = per_step + t_rebuild / 30
print(f"per-step {per_step*1e3:.2f} ms; rebuild amortized(30) "
      f"{t_rebuild/30*1e3:.2f} ms; total {amort*1e3:.2f} ms "
      f"-> {n/amort:,.0f} atom-steps/s")

# ---- rebuild stage decomposition ----
cutoff = model.cutoff + 0.6
pos_j = state.positions
cell_j = state.cell

@jax.jit
def stage_sort(p):
    gx, gy, gz = grid
    inv = jnp.linalg.inv(cell_j)
    f = p @ inv
    f = f - jnp.floor(f)
    dims = jnp.asarray(grid)
    b3 = jnp.clip((f * dims).astype(jnp.int32), 0, dims - 1)
    bid = (b3[:, 0] * gy + b3[:, 1]) * gz + b3[:, 2]
    order = jnp.argsort(bid).astype(jnp.int32)
    return order, jnp.argsort(order).astype(jnp.int32)

(order, inv_order), _ = timeit("  binsort (2 argsorts)", lambda: stage_sort(pos_j))
spos = jax.block_until_ready(pos_j[order])

build = jax.jit(lambda p: build_neighbor_list(
    p, cell_j, cutoff, max_neighbors=J, grid=grid, with_reverse=False).idx)
idx, _ = timeit("  cell build (bins+stencil+top_k)", lambda: build(spos))

n_pad = -(-n // 256) * 256
rows = jnp.arange(n_pad, dtype=jnp.int32)
pad_rows = jnp.broadcast_to(rows[:, None], (n_pad, J))

@jax.jit
def stage_rowsort(idx):
    return jnp.sort(pad_rows.at[:n].set(idx), axis=1)

idx_pad, _ = timeit("  row sort (J)", lambda: stage_rowsort(idx))

wi0 = jax.jit(lambda i: pad_window_lists(i, n_pad))(idx_pad)
timeit("  pad_window_lists", lambda: jax.jit(
    lambda i: pad_window_lists(i, n_pad))(idx_pad))
(wl, wlc, cov), _ = timeit("  worklists", lambda: jax.jit(
    lambda w: worklists(w, num_tiles(n_pad)))(wi0))

pos_pad = jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(spos)
dispT, _ = timeit("  window_disp (rebuild)", lambda: window_disp(
    pos_pad, wi0, wl, wlc, cell_j))
cls, _ = timeit("  octant_classes_T", lambda: jax.jit(octant_classes_T)(dispT, idx_pad))
timeit("  assign_slots_apply", lambda: jax.jit(assign_slots_apply)(idx_pad, wi0, cls)[0])
idx_al, wi_al, aligned = jax.jit(assign_slots_apply)(idx_pad, wi0, cls)
idx_al = jax.block_until_ready(idx_al)
timeit("  reverse_slots", lambda: jax.jit(reverse_slots)(idx_al)[0])
mirror, rev = jax.jit(reverse_slots)(idx_al)
timeit("  giveback_metadata", lambda: jax.jit(
    lambda a, b, c, w: giveback_metadata(a, b, c, num_tiles(n_pad), w)["bases"])(
    idx_al, wi_al, rev, wl))
