"""Probe: does XLA-on-TPU lower small-K (N,3)@(3,3) / thin (3,N)@(N,3)
matmuls at an MXU precision that rounds f32 operands?

If yes: positions @ cell-matrix products in the integrators/neighbor paths
carry ~2^-9 relative operand error (0.5 A at a 252 A box) and must be
unrolled or pinned. Values only (no timing) — dispatch overhead irrelevant.
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend())
rng = np.random.default_rng(0)
pos64 = rng.uniform(0, 252.0, (4096, 3))
pos = jnp.asarray(pos64, jnp.float32)
eye = jnp.eye(3, dtype=jnp.float32)
m64 = rng.normal(0, 1, (3, 3)) * 0.01 + np.eye(3)
m = jnp.asarray(m64, jnp.float32)

@jax.jit
def f_default(p, m):
    return p @ m

@jax.jit
def f_highest(p, m):
    return jnp.matmul(p, m, precision=jax.lax.Precision.HIGHEST)

@jax.jit
def f_unrolled(p, m):
    return jnp.stack(
        [p[:, 0] * m[0, a] + p[:, 1] * m[1, a] + p[:, 2] * m[2, a] for a in range(3)],
        axis=1,
    )

# identity test: any operand rounding shows up directly
d_eye = f_default(pos, eye)
print("max |p@I - p| default :", float(jnp.max(jnp.abs(d_eye - pos))))

ref = np.asarray(f_unrolled(pos, m), np.float64)
for name, fn in [("default", f_default), ("HIGHEST", f_highest)]:
    v = np.asarray(fn(pos, m), np.float64)
    print(f"max |p@M - unrolled| {name:8s}:", np.abs(v - ref).max())

# thin reduction (3,N)@(N,3) — the KE/virial tensor shape
v64 = rng.normal(0, 0.01, (4096, 3))
vv = jnp.asarray(v64, jnp.float32)
ref2 = v64.T @ v64

@jax.jit
def g_default(v):
    return v.T @ v

@jax.jit
def g_highest(v):
    return jnp.matmul(v.T, v, precision=jax.lax.Precision.HIGHEST)

for name, fn in [("default", g_default), ("HIGHEST", g_highest)]:
    out = np.asarray(fn(vv), np.float64)
    print(f"rel err vT@v {name:8s}:", np.abs(out - ref2).max() / np.abs(ref2).max())

# einsum nja,njb->ab (sharded virial shape)
a64 = rng.normal(0, 1, (4096, 64, 3))
b64 = rng.normal(0, 1, (4096, 64, 3))
aa, bb = jnp.asarray(a64, jnp.float32), jnp.asarray(b64, jnp.float32)
ref3 = np.einsum("nja,njb->ab", a64, b64)

@jax.jit
def h_default(a, b):
    return jnp.einsum("nja,njb->ab", a, b)

@jax.jit
def h_highest(a, b):
    return jnp.einsum("nja,njb->ab", a, b, precision=jax.lax.Precision.HIGHEST)

for name, fn in [("default", h_default), ("HIGHEST", h_highest)]:
    out = np.asarray(fn(aa, bb), np.float64)
    print(f"rel err einsum {name:8s}:", np.abs(out - ref3).max() / np.abs(ref3).max())
