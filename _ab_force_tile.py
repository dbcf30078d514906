"""A/B force tile width at N0=3500 (npad 3584) on v5e."""
import time
import jax, jax.numpy as jnp
import numpy as np
from mdqtplasmasims_tpu.ops.yukawa import yukawa_forces_n3l_soa
from mdqtplasmasims_tpu.units import PlasmaUnits

n, npad = 3500, 3584
L = PlasmaUnits.box_length(n)
ldeb = PlasmaUnits(2.0, 0.1).debye_length
key = jax.random.PRNGKey(0)
Rp = jnp.zeros((3, npad), jnp.float32).at[:, :n].set(
    jax.random.uniform(key, (3, n), jnp.float32, 0, L))
mask = jnp.zeros((1, npad), jnp.float32).at[0, :n].set(1.0)

def bench(tile, iters=200):
    f = jax.jit(lambda R: yukawa_forces_n3l_soa(R, mask, L, ldeb, tile=tile))
    out = f(Rp); _ = float(out[0, 0])   # force completion via scalar fetch
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(out * 0 + Rp)  # keep a data dependency, avoid cache replay
    _ = float(out[0, 0])
    return (time.perf_counter() - t0) / iters * 1e6

for tile in (128, 256, 512):
    try:
        us = bench(tile)
        print(f"tile {tile}: {us:8.1f} us/call")
    except Exception as e:
        print(f"tile {tile}: FAIL {type(e).__name__}: {str(e)[:120]}")
