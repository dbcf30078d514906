"""Prototype: triangle-enumerated half-pair force kernel.

The square-grid half-pair kernel spends 21 of 49 grid steps at nt=7
(N=3500) on skipped lower-triangle tiles; the round-robin grid has no
skips but its modular ys indexing measures ~5% slower at small nt.  This
variant enumerates exactly the nt(nt+1)/2 upper-triangle tile pairs with
a 1-D grid and scalar-prefetched (I, J) index tables: no skipped steps,
i-major order (f output block revisited consecutively, ys block
ascending within a row).

Also probes the exp() share of the pair math (exp replaced by a
polynomial of matching cost=0) for the roofline doc.

Usage: python tools/exp_triangle.py [n_evals]
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from mdqtplasmasims_tpu.ops.yukawa import (          # noqa: E402
    _half_pair_tile, yukawa_forces, yukawa_forces_n3l_pallas)
from mdqtplasmasims_tpu.units import PlasmaUnits      # noqa: E402

N_EVALS = int(sys.argv[1]) if len(sys.argv) > 1 else 200


def _tri_kernel(ij_ref, xl_ref, ys_ref, f_ref, g_ref, *, L, ldeb, rcut2):
    k = pl.program_id(0)
    i = ij_ref[0, k]
    j = ij_ref[1, k]

    @pl.when(i == j)
    def _():
        f_ref[...] = jnp.zeros_like(f_ref)

    fx, fy, fz, gx, gy, gz = _half_pair_tile(
        xl_ref[...], ys_ref[...], L=L, ldeb=ldeb, rcut2=rcut2,
        reaction=True)
    f_ref[0, :] += fx
    f_ref[1, :] += fy
    f_ref[2, :] += fz
    off = jnp.where(j > i, -1.0, 0.0).astype(fx.dtype)
    g_ref[0, :, 0] = off * gx
    g_ref[0, :, 1] = off * gy
    g_ref[0, :, 2] = off * gz


@functools.partial(jax.jit, static_argnames=("L", "ldeb", "tile",
                                             "interpret"))
def _tri_n3l(Rl4, Rs, *, L, ldeb, tile, interpret=False):
    npad = Rl4.shape[1]
    nt = npad // tile
    II, JJ = [], []
    for i in range(nt):
        for j in range(i, nt):
            II.append(i)
            JJ.append(j)
    m = len(II)
    ij = jnp.asarray(np.stack([II, JJ]), jnp.int32)
    kern = functools.partial(_tri_kernel, L=L, ldeb=ldeb,
                             rcut2=(L / 2.0) ** 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((4, tile), lambda k, ij: (0, ij[0, k]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 8), lambda k, ij: (ij[1, k], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((3, tile), lambda k, ij: (0, ij[0, k]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 8), lambda k, ij: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    f, g = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((3, npad), Rl4.dtype),
            jax.ShapeDtypeStruct((m, tile, 8), Rl4.dtype),
        ),
        interpret=interpret,
    )(ij, Rl4, Rs)
    # scatter the per-step reaction rows onto their j tiles (J static)
    gj = jnp.zeros((nt, tile, 8), Rl4.dtype).at[jnp.asarray(JJ)].add(g)
    return f + gj.reshape(npad, 8)[:, :3].T


def tri_forces(R, L, ldeb, tile=512, interpret=False):
    n = R.shape[0]
    npad = -(-max(n, tile) // tile) * tile
    Rl4 = jnp.zeros((4, npad), R.dtype)
    Rl4 = Rl4.at[:3, :n].set(R.T).at[3, :n].set(1.0)
    Rs = jnp.zeros((npad, 8), R.dtype).at[:n, :3].set(R).at[:n, 3].set(1.0)
    F = _tri_n3l(Rl4, Rs, L=L, ldeb=ldeb, tile=tile, interpret=interpret)
    return F[:, :n].T


def time_loop(fn, R, n_evals):
    @jax.jit
    def loop(R):
        def body(R, _):
            return R + 1e-12 * fn(R), None
        R, _ = jax.lax.scan(body, R, None, length=n_evals)
        return jnp.sum(R)

    float(loop(R))
    t0 = time.perf_counter()
    float(loop(R))
    return (time.perf_counter() - t0) / n_evals * 1e6


def main():
    pu = PlasmaUnits(2.0, 0.1)
    for n in (3500, 14000):
        L = PlasmaUnits.box_length(n)
        R = jax.random.uniform(jax.random.PRNGKey(0), (n, 3),
                               jnp.float32, 0, L)
        # correctness first
        F_ref = np.asarray(yukawa_forces(R, L, pu.debye_length, chunk=512))
        F_tri = np.asarray(tri_forces(R, L, pu.debye_length))
        err = np.abs(F_tri - F_ref).max() / np.abs(F_ref).max()
        print(f"N={n}: tri vs XLA max rel err {err:.2e}", flush=True)
        us_sq = time_loop(
            lambda R: yukawa_forces_n3l_pallas(R, L, pu.debye_length,
                                               tile=512), R, N_EVALS)
        us_tri = time_loop(
            lambda R: tri_forces(R, L, pu.debye_length), R, N_EVALS)
        print(f"N={n}: dispatch(sq/rr)={us_sq:.1f} us  tri={us_tri:.1f} us",
              flush=True)


if __name__ == "__main__":
    main()
