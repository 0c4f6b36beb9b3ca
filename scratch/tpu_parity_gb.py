"""TPU f32 parity: window+giveback vs window+mirror vs xla, then quick bench."""
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
grid = grid_shape(cell, model.cutoff + 0.6)

sims = {
    "gb": Simulation(model, max_neighbors=56, skin=0.6, window=True, giveback=True, compute_virial=True),
    "mirror": Simulation(model, max_neighbors=56, skin=0.6, window=True, giveback=False, compute_virial=True),
}
res = {}
for name, sim in sims.items():
    nl = sim.rebuild(state, grid=grid, max_neighbors=56)
    assert not bool(nl.overflow), name
    s = sim.refresh_forces(state, nl)
    res[name] = (np.asarray(s.forces), float(s.potential_energy), np.asarray(s.virial))
    print(name, "PE", res[name][1])
df = np.abs(res["gb"][0] - res["mirror"][0]).max()
de = abs(res["gb"][1] - res["mirror"][1])
dv = np.abs(res["gb"][2] - res["mirror"][2]).max()
print(f"TPU parity gb vs mirror: max|dF|={df:.3e} dE={de:.3e} max|dvir|={dv:.3e}")
assert df < 1e-3 and de < 1e-2, "TPU parity failure"

# bench at J=64 (class capacity 8 -> ~0.5 spills/atom)
for name, spb in [("gb64", 30)]:
    sim = Simulation(model, max_neighbors=64, skin=0.6, steps_per_rebuild=spb,
                     compute_virial=False, window=True, giveback=True)
    st, _, ovf = sim.run_async(state, 60, ensemble="nve", dt=0.001)
    float(jnp.sum(st.positions)); assert not bool(ovf)
    st2, _, ovf = sim.run_async(st, 200, ensemble="nve", dt=0.001)
    float(jnp.sum(st2.positions)); assert not bool(ovf)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        st2, _, ovf = sim.run_async(st, 200, ensemble="nve", dt=0.001)
        float(jnp.sum(st2.positions))
        best = min(best, time.perf_counter() - t0)
    assert not bool(ovf)
    print(f"giveback J=64 bench: {best*1e3/200:.3f} ms/step, {n*200/best:,.0f} atom-steps/s")
