"""AL grade-eval decomposition at 32k: where do the 306 ms go?"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from mtp_tpu.al.grades import candidates_and_forces, nbh_grades
from mtp_tpu.al.maxvol import build_mvs
from mtp_tpu.io.basis_gen import make_mtp
from mtp_tpu.md.simulation import Simulation, make_lattice
from mtp_tpu.md.state import init_state, thermalize
from mtp_tpu.models.mtp import MTPModel, _gather_rows3, _gather_scalar
from mtp_tpu.al.grades import candidate_vectors
from mtp_tpu.ops.neighbors import build_neighbor_list, grid_shape

m16 = make_mtp(16, species_count=1, seed=0)
# small MVS so the monitor machinery works
pos4, types4, cell4 = make_lattice("fcc", 4.0, (6, 6, 6))
rng = np.random.default_rng(1)
p4 = jnp.asarray(pos4 + rng.normal(scale=0.05, size=pos4.shape), jnp.float32)
nl4 = build_neighbor_list(p4, jnp.asarray(cell4, jnp.float32), 5.0,
                          max_neighbors=64, grid=grid_shape(cell4, 5.0))
model_tmp = MTPModel.from_data(m16, dtype=jnp.float32)
b4, _ = candidate_vectors(model_tmp.schedule, model_tmp.coeffs, p4,
                          jnp.asarray(types4), nl4.idx, jnp.asarray(cell4, jnp.float32))
m16.mvs = build_mvs(np.asarray(b4), mode="neighborhood")
model = MTPModel.from_data(m16, dtype=jnp.float32)

pos, types, cell = make_lattice("fcc", 4.0, (20, 20, 20))
n = len(pos)
state = thermalize(
    jax.random.PRNGKey(5),
    init_state(pos, types, np.full(n, 58.693), cell, dtype=jnp.float32), 300.0)
sim = Simulation(model, max_neighbors=64, skin=0.6, steps_per_rebuild=30,
                 compute_virial=False)
grid = grid_shape(cell, model.cutoff + 0.6)
swl = sim.rebuild(state, grid=grid, max_neighbors=64)
jax.block_until_ready(swl.idx)
print("nl type:", type(swl).__name__, flush=True)

n_pad = swl.idx.shape[0]
pos_s = jnp.pad(_gather_rows3(state.positions, swl.order), ((0, n_pad - n), (0, 0)))
types_s = jnp.pad(_gather_scalar(state.types, swl.order), (0, n_pad - n))
row_valid = jnp.arange(n_pad) < n

K = 8


def bench(label, fn, x0, *args):
    @jax.jit
    def run(x, *a):
        def step(c, i):
            o = fn(x + i.astype(x.dtype) * jnp.asarray(1e-30, x.dtype), *a)
            return c + jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32)) * 1e-30, None
        out, _ = jax.lax.scan(step, 0.0, jnp.arange(K, dtype=jnp.int32))
        return out

    float(run(x0, *args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x0, *args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best / K * 1e3:.2f} ms/iter", flush=True)


bench("candidates_and_forces (full)",
      lambda p, ts, idx, mir, rv: candidates_and_forces(
          model.schedule, model.coeffs, p, ts, idx, state.cell, mir,
          row_valid=rv),
      pos_s, types_s, swl.idx, swl.mirror, row_valid)

out = candidates_and_forces(model.schedule, model.coeffs, pos_s, types_s,
                            swl.idx, state.cell, swl.mirror, row_valid=row_valid)
b = out["b"]
print("b shape:", b.shape, "invA:", model.inverse_active_set.shape, flush=True)
bench("nbh_grades matmul", lambda bb: nbh_grades(bb, model.inverse_active_set), b)

# host-roundtrip cost of the monitor protocol (max + np.asarray)
g = nbh_grades(b, model.inverse_active_set)
t0 = time.perf_counter()
for _ in range(5):
    _ = float(jnp.max(g)); _ = np.asarray(g)
print(f"host sync (max + asarray): {(time.perf_counter()-t0)/5*1e3:.2f} ms", flush=True)
