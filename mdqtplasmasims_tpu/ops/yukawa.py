"""All-pairs Yukawa (screened-Coulomb) force and potential kernels.

The reference computes O(N^2/2) pair forces with an OpenMP loop and a racy
Newton's-third-law scatter (laserCoolingPlusExpansionMDQTSpeedUp.cpp:192-236;
MonteCarloFollowedByMDAndTempAnisotropy.cpp:387-448).  Here the interaction
is evaluated over the *full* N x N tile set (both triangles) so every output
row is an independent reduction — no scatter, no race, and a perfect fit for
TPU tiling.  Physics:

    force:      f(r) = (1/r + 1/lDeb) * exp(-r/lDeb) / r^2 * dr_vec
                (laserCooling...SpeedUp.cpp:224; equivalently
                 exp(-kappa r)(1/r^3 + kappa/r^2), MC family calcAIJ :161-169)
    potential:  u(r) = exp(-r/lDeb)/r            (Epotential :268, calcUIJ :155)
    minimum-image convention, half-box cutoff Rcut = L/2, r > 0.

Layout note (TPU): coordinates are handled as *per-axis* 2-D arrays — an
[N, 3] layout would pad the minor dimension 3 -> 128 lanes and waste ~40x
memory bandwidth.  Two implementations:

  * ``yukawa_forces`` / ``yukawa_forces_potential`` — pure XLA, row-chunked
    per-axis broadcast (any backend, f64-able for validation).
  * ``yukawa_forces_potential_pallas`` — tiled Pallas TPU kernel; the i-side
    positions ride lanes ([3, Np]) and the j-side rides sublanes ([Np, 8])
    so the pairwise (TJ, TI) tile reduces over sublanes straight onto the
    lane-aligned output accumulator.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

try:  # Pallas is TPU-only at runtime; importing is safe everywhere.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def yukawa_forces_potential(R: jax.Array, L: float, ldeb: float,
                            mask: Optional[jax.Array] = None,
                            chunk: int = 512,
                            cols: Optional[jax.Array] = None,
                            ) -> Tuple[jax.Array, jax.Array]:
    """Forces [N,3] and per-ion potential sums [N] (pure XLA).

    ``sum(pot)/(2*N)`` equals the reference's Epot per particle.
    ``cols`` optionally supplies a different source set (e.g. the
    all-gathered global positions when ``R`` is an ion shard); ``mask``
    applies to the column/source set.
    """
    n = R.shape[0]
    rcut2 = (L / 2.0) ** 2
    chunk = min(chunk, n)
    npad = _round_up(n, chunk)
    Rc = R if cols is None else cols
    Rx, Ry, Rz = Rc[:, 0], Rc[:, 1], Rc[:, 2]
    mj = mask if mask is not None else None

    def pad(v):
        return jnp.pad(v, (0, npad - n)).reshape(-1, chunk)

    Rrx, Rry, Rrz = R[:, 0], R[:, 1], R[:, 2]

    def row_block(args):
        xi, yi, zi = args
        dx = xi[:, None] - Rx[None, :]
        dy = yi[:, None] - Ry[None, :]
        dz = zi[:, None] - Rz[None, :]
        dx -= L * jnp.round(dx / L)
        dy -= L * jnp.round(dy / L)
        dz -= L * jnp.round(dz / L)
        r2 = dx * dx + dy * dy + dz * dz
        valid = (r2 > 0) & (r2 < rcut2)
        if mj is not None:
            valid = valid & (mj[None, :] > 0)
        r = jnp.sqrt(jnp.where(valid, r2, 1.0))
        expf = jnp.exp(-r / ldeb)
        ft = jnp.where(valid, (1.0 / r + 1.0 / ldeb) * expf / r2, 0.0)
        up = jnp.where(valid, expf / r, 0.0)
        return (jnp.sum(dx * ft, 1), jnp.sum(dy * ft, 1), jnp.sum(dz * ft, 1),
                jnp.sum(up, 1))

    fx, fy, fz, pot = jax.lax.map(row_block, (pad(Rrx), pad(Rry), pad(Rrz)))
    F = jnp.stack([fx.ravel()[:n], fy.ravel()[:n], fz.ravel()[:n]], axis=-1)
    pot = pot.ravel()[:n]
    if mask is not None and cols is None:
        F = F * mask[:, None]
        pot = pot * mask
    return F, pot


def yukawa_forces(R, L, ldeb, mask=None, chunk: int = 512) -> jax.Array:
    return yukawa_forces_potential(R, L, ldeb, mask, chunk)[0]


def yukawa_potential(R, L, ldeb, mask=None, chunk: int = 512) -> jax.Array:
    """Potential energy per particle (scalar), reference Epotential().
    ``mask`` marks which rows exist: it gates both the source set and the
    row sums (padded lanes contribute nothing)."""
    _, pot = yukawa_forces_potential(R, L, ldeb, mask, chunk)
    if mask is None:
        return 0.5 * jnp.sum(pot) / R.shape[0]
    return 0.5 * jnp.sum(pot * mask) / jnp.sum(mask)


# ----------------------------------------------------------------------
# Pallas TPU kernel
# ----------------------------------------------------------------------

def _pair_tile_rows(x, ys, L, ldeb, rcut2, with_pot=True):
    """Pair math for one (i-block [3,TI], j-block [TJ,8]) tile pair.
    Returns the accumulation rows (fx, fy, fz[, pot]), each [TI].
    The (1, TI) - (TJ, 1) broadcast puts the j-reduction on sublanes and
    the per-i result on lanes.  rsqrt-based: no sqrt or division."""
    dx = x[0:1, :] - ys[:, 0:1]
    dy = x[1:2, :] - ys[:, 1:2]
    dz = x[2:3, :] - ys[:, 2:3]
    dx -= L * jnp.round(dx * (1.0 / L))
    dy -= L * jnp.round(dy * (1.0 / L))
    dz -= L * jnp.round(dz * (1.0 / L))
    r2 = dx * dx + dy * dy + dz * dz
    valid = (r2 > 0) & (r2 < rcut2) & (ys[:, 3:4] > 0)
    r2s = jnp.where(valid, r2, 1.0)
    inv_r = jax.lax.rsqrt(r2s)
    inv_r2 = inv_r * inv_r
    r = r2s * inv_r
    expf = jnp.exp(-r * (1.0 / ldeb))
    # (1/r + 1/ldeb) e^{-r/ldeb} / r^2 = e^{-r/ldeb} (1/r + 1/ldeb) / r^2
    ft = jnp.where(valid, expf * (inv_r + 1.0 / ldeb) * inv_r2, 0.0)
    out = (jnp.sum(dx * ft, axis=0), jnp.sum(dy * ft, axis=0),
           jnp.sum(dz * ft, axis=0))
    if with_pot:
        up = jnp.where(valid, expf * inv_r, 0.0)
        out = out + (jnp.sum(up, axis=0),)
    return out


def _yukawa_kernel(xl_ref, ys_ref, f_ref, *, L, ldeb, rcut2, with_pot=True):
    """Grid (i_tiles, j_tiles).  xl_ref: [3, TI] i-block (lanes), ys_ref:
    [TJ, 8] j-block (sublanes; cols 0-2 = xyz, col 3 = mask), f_ref:
    [4|3, TI] accumulator (rows 0-2 force, optional row 3 potential)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        f_ref[...] = jnp.zeros_like(f_ref)

    rows = _pair_tile_rows(xl_ref[...], ys_ref[...], L, ldeb, rcut2,
                           with_pot=with_pot)
    f_ref[0, :] += rows[0]
    f_ref[1, :] += rows[1]
    f_ref[2, :] += rows[2]
    if with_pot:
        f_ref[3, :] += rows[3]


def _yukawa_kernel_batched(xl_ref, ys_ref, f_ref, *, L, ldeb, rcut2):
    """Grid (E, i_tiles, j_tiles); blocks carry a leading singleton
    ensemble dim."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        f_ref[...] = jnp.zeros_like(f_ref)

    fx, fy, fz, up = _pair_tile_rows(xl_ref[0], ys_ref[0], L, ldeb, rcut2)
    f_ref[0, 0, :] += fx
    f_ref[0, 1, :] += fy
    f_ref[0, 2, :] += fz
    f_ref[0, 3, :] += up


@functools.partial(jax.jit, static_argnames=("L", "ldeb", "tile", "with_pot"))
def _yukawa_pallas(Rl: jax.Array, Rs: jax.Array, *, L: float, ldeb: float,
                   tile: int, with_pot: bool = True) -> jax.Array:
    npad = Rl.shape[1]
    grid = (npad // tile, npad // tile)
    rows = 4 if with_pot else 3
    kern = functools.partial(_yukawa_kernel, L=L, ldeb=ldeb,
                             rcut2=(L / 2.0) ** 2, with_pot=with_pot)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tile), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, tile), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, npad), Rl.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(Rl, Rs)


def pack_soa(R: jax.Array, mask: Optional[jax.Array], tile: int):
    """[N,3] -> ([3,Np] lane layout, [Np,8] sublane layout with mask col)."""
    n = R.shape[0]
    npad = _round_up(max(n, tile), tile)
    m = mask if mask is not None else jnp.ones((n,), R.dtype)
    Rl = jnp.zeros((3, npad), R.dtype).at[:, :n].set(R.T)
    Rs = jnp.zeros((npad, 8), R.dtype).at[:n, :3].set(R).at[:n, 3].set(m)
    return Rl, Rs


def yukawa_forces_potential_pallas(R: jax.Array, L: float, ldeb: float,
                                   mask: Optional[jax.Array] = None,
                                   tile: int = 512, with_pot: bool = True):
    """Fused forces (+ optionally per-ion potential sums) via the Pallas
    kernel.  Returns ``(F [N,3], pot_per_ion [N] | None)``.  The hot MD
    loop uses ``with_pot=False`` — the potential is only needed at sample
    times."""
    n = R.shape[0]
    Rl, Rs = pack_soa(R, mask, tile)
    out = _yukawa_pallas(Rl, Rs, L=float(L), ldeb=float(ldeb), tile=tile,
                         with_pot=with_pot)
    F = out[:3, :n].T
    pot = out[3, :n] if with_pot else None
    if mask is not None:
        F = F * mask[:, None]
        if pot is not None:
            pot = pot * mask
    return F, pot


def yukawa_forces_pallas(R, L, ldeb, mask=None, tile: int = 512):
    return yukawa_forces_potential_pallas(R, L, ldeb, mask, tile)[0]


def yukawa_potential_pallas(R, L, ldeb, mask=None, tile: int = 512):
    _, pot = yukawa_forces_potential_pallas(R, L, ldeb, mask, tile)
    n_eff = jnp.sum(mask) if mask is not None else R.shape[0]
    return 0.5 * jnp.sum(pot) / n_eff


def _n3l_pairs(nt: int):
    """Triangle tile-pair enumeration for the half-pair schedule: the
    nt(nt+1)/2 unordered pairs {i, j>=i}, i-major with j ascending, as
    static (I, J) index tables.  The 1-D grid over these tables (block
    indices read from scalar-prefetched tables) beats both a j>=i test
    over an (nt, nt) grid (whose skipped lower-triangle steps still cost
    block bookkeeping: -7% at nt=7/N=3500 on v5e) and a round-robin
    {i, (i+jj)%nt} grid (whose modular ys indexing defeats sequential
    prefetch: -1.5% at nt=28/N=14000).  i-major order keeps the f output
    block resident across a row and the ys fetches sequential."""
    II, JJ = [], []
    for i in range(nt):
        for j in range(i, nt):
            II.append(i)
            JJ.append(j)
    return II, JJ


def _half_pair_tile(x, ys, *, L, ldeb, rcut2, reaction):
    """Shared half-pair tile math.  x [4, TI] (row 3 = i mask), ys
    [TJ, 8].  Returns (fx, fy, fz) i-side row sums [TI] and, when
    ``reaction`` is set, (gx, gy, gz) j-side reaction column sums [TJ].

    ``ldeb=None`` reads 1/ldeb from ys column 4 instead of a compile-time
    constant: the screening length rides the position operand, so one
    compiled kernel serves members with *different* kappa (the transport
    family's (Gamma, kappa) sweeps) — under vmap or the explicit batch
    grid each member's blocks carry its own value, with no extra operand
    or batching-rule concern.  The whole column is read ([TJ, 1], every
    row carries the same value) because Mosaic cannot broadcast a (1, 1)
    vector in sublanes and lanes at once."""
    inv_ldeb = ys[:, 4:5] if ldeb is None else 1.0 / ldeb
    dx = x[0:1, :] - ys[:, 0:1]
    dy = x[1:2, :] - ys[:, 1:2]
    dz = x[2:3, :] - ys[:, 2:3]
    dx -= L * jnp.round(dx * (1.0 / L))
    dy -= L * jnp.round(dy * (1.0 / L))
    dz -= L * jnp.round(dz * (1.0 / L))
    r2 = dx * dx + dy * dy + dz * dz
    valid = ((r2 > 0) & (r2 < rcut2) & (ys[:, 3:4] > 0)
             & (x[3:4, :] > 0))
    r2s = jnp.where(valid, r2, 1.0)
    inv_r = jax.lax.rsqrt(r2s)
    r = r2s * inv_r
    ft = jnp.where(valid, jnp.exp(-r * inv_ldeb)
                   * (inv_r + inv_ldeb) * inv_r * inv_r, 0.0)
    fxt = dx * ft
    fyt = dy * ft
    fzt = dz * ft
    rows = (jnp.sum(fxt, axis=0), jnp.sum(fyt, axis=0),
            jnp.sum(fzt, axis=0))
    if not reaction:
        return rows
    return rows + (jnp.sum(fxt, axis=1), jnp.sum(fyt, axis=1),
                   jnp.sum(fzt, axis=1))


def _yukawa_n3l_kernel(ij_ref, xl_ref, ys_ref, f_ref, g_ref, *, L, ldeb,
                       rcut2):
    """Half-pair (Newton's-third-law) force kernel on the triangle grid:
    the k-th step handles tile pair (i, j) = ij[:, k] from the static
    _n3l_pairs tables (scalar-prefetched so the block DMA engine can
    read them ahead).  The i-side sums accumulate into ``f_ref`` (the
    i == j diagonal step is first in each row and initializes it); the
    j-side *reaction* sums go to the per-step scatter buffer ``g_ref``,
    scatter-reduced onto their j tiles outside.  This is the TPU-shaped
    version of the reference's third-law update ``F(jj) -= ...``
    (laserCoolingPlusExpansionMDQTSpeedUp.cpp:228-233) — no racy
    scatter, just one extra buffer reduction.

    ``xl_ref`` is [4, TI] (row 3 = i-side mask: padded i lanes must not
    push reaction forces onto real j ions); ``ys_ref`` [TJ, 8] as usual.
    Diagonal steps evaluate both ordered pairs on the i side and write
    zero reaction rows, so nothing is double counted."""
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
def _yukawa_n3l(Rl4: jax.Array, Rs: jax.Array, *, L: float, ldeb: float,
                tile: int, interpret: bool = False) -> jax.Array:
    npad = Rl4.shape[1]
    nt = npad // tile
    II, JJ = _n3l_pairs(nt)
    m = len(II)
    ij = jnp.asarray([II, JJ], jnp.int32)
    kern = functools.partial(_yukawa_n3l_kernel, L=L, ldeb=ldeb,
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(ij, Rl4, Rs)
    # scatter the per-step reaction rows onto their j tiles (JJ static)
    gj = jnp.zeros((nt, tile, 8), Rl4.dtype).at[jnp.asarray(JJ)].add(g)
    return f + gj.reshape(npad, 8)[:, :3].T


def yukawa_forces_n3l_pallas(R: jax.Array, L: float, ldeb: float,
                             mask: Optional[jax.Array] = None,
                             tile: int = 512,
                             interpret: bool = False) -> jax.Array:
    """Force-only half-pair Pallas kernel: each unordered ion pair is
    evaluated once (triangle-enumerated grid, _n3l_pairs) and its
    reaction partner filled in by Newton's third law — ~1.5x the
    full-tile kernel's rate on v5e.  Diagnostics that need the potential
    keep using the full kernel at sample times.  Returns ``F [N, 3]``.

    ``ldeb`` may be a traced jax scalar: the kernel then reads 1/ldeb
    from the position operand's spare column (see _half_pair_tile), so
    kappa can vary per vmapped member inside one compiled program."""
    n = R.shape[0]
    npad = _round_up(max(n, tile), tile)
    m = mask if mask is not None else jnp.ones((n,), R.dtype)
    Rl4 = (jnp.zeros((4, npad), R.dtype).at[:3, :n].set(R.T)
           .at[3, :n].set(m))
    Rs = jnp.zeros((npad, 8), R.dtype).at[:n, :3].set(R).at[:n, 3].set(m)
    if isinstance(ldeb, jax.Array):
        Rs = Rs.at[:, 4].set((1.0 / ldeb).astype(R.dtype))
        ldeb_static = None
    else:
        ldeb_static = float(ldeb)
    out = _yukawa_n3l(Rl4, Rs, L=float(L), ldeb=ldeb_static, tile=tile,
                      interpret=interpret)
    return out[:, :n].T


def _yukawa_n3l_kernel_batched(ij_ref, xl_ref, ys_ref, f_ref, g_ref, *,
                               L, ldeb, rcut2):
    """Ensemble-batched half-pair kernel: grid (E, pairs) with a leading
    singleton ensemble dim on every block; same triangle schedule and
    tile math as the unbatched kernel."""
    k = pl.program_id(1)
    i = ij_ref[0, k]
    j = ij_ref[1, k]

    @pl.when(i == j)
    def _():
        f_ref[...] = jnp.zeros_like(f_ref)

    fx, fy, fz, gx, gy, gz = _half_pair_tile(
        xl_ref[0], ys_ref[0], L=L, ldeb=ldeb, rcut2=rcut2,
        reaction=True)
    f_ref[0, 0, :] += fx
    f_ref[0, 1, :] += fy
    f_ref[0, 2, :] += fz
    off = jnp.where(j > i, -1.0, 0.0).astype(fx.dtype)
    g_ref[0, 0, :, 0] = off * gx
    g_ref[0, 0, :, 1] = off * gy
    g_ref[0, 0, :, 2] = off * gz


@functools.partial(jax.jit, static_argnames=("L", "ldeb", "tile",
                                             "interpret"))
def _yukawa_n3l_batched(Rl4: jax.Array, Rs: jax.Array, *, L: float,
                        ldeb: float, tile: int,
                        interpret: bool = False) -> jax.Array:
    e, _, npad = Rl4.shape
    nt = npad // tile
    II, JJ = _n3l_pairs(nt)
    m = len(II)
    ij = jnp.asarray([II, JJ], jnp.int32)
    kern = functools.partial(_yukawa_n3l_kernel_batched, L=L, ldeb=ldeb,
                             rcut2=(L / 2.0) ** 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e, m),
        in_specs=[
            pl.BlockSpec((1, 4, tile), lambda b, k, ij: (b, 0, ij[0, k]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 8), lambda b, k, ij: (b, ij[1, k], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 3, tile), lambda b, k, ij: (b, 0, ij[0, k]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile, 8), lambda b, k, ij: (b, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    f, g = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((e, 3, npad), Rl4.dtype),
            jax.ShapeDtypeStruct((e, m, tile, 8), Rl4.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(ij, Rl4, Rs)
    gj = jnp.zeros((e, nt, tile, 8), Rl4.dtype).at[:, jnp.asarray(JJ)].add(g)
    return f + jnp.swapaxes(gj.reshape(e, npad, 8)[:, :, :3], 1, 2)


def soa_force_tile(npad: int) -> int:
    """Largest force-tile width that divides an already-padded lane count
    (the SoA loop pads with the *QT* tile — 512/896/1024/1792/3584, all
    multiples of 128 — which need not be a multiple of the force tile)."""
    for t in (512, 256, 128):
        if npad % t == 0:
            return t
    raise ValueError(f"npad {npad} not a multiple of 128")


def yukawa_forces_n3l_soa(Rp: jax.Array, mask_row: jax.Array, L: float,
                          ldeb: float, tile: Optional[int] = None,
                          interpret: bool = False) -> jax.Array:
    """Half-pair forces straight from the lane layout: ``Rp [3, Np]``
    (padded, as carried by the SoA-resident MD loop) and a static
    ``mask_row [1, Np]`` marking real ions.  Skips the ``[N,3]``
    round-trip the array-of-structs wrapper pays per call; only the
    unavoidable lane->sublane transpose for the j-side remains.
    ``tile`` defaults to the largest width dividing Np (it MUST divide —
    the kernel grid covers exactly nt*tile lanes).  Returns ``F [3, Np]``."""
    npad = Rp.shape[1]
    if tile is None:
        tile = soa_force_tile(npad)
    if npad % tile != 0:
        raise ValueError(f"force tile {tile} does not divide npad {npad}")
    Rl4 = jnp.concatenate([Rp, mask_row], axis=0)
    Rs = (jnp.zeros((npad, 8), Rp.dtype).at[:, :3].set(Rp.T)
          .at[:, 3].set(mask_row[0]))
    return _yukawa_n3l(Rl4, Rs, L=float(L), ldeb=float(ldeb), tile=tile,
                       interpret=interpret)


def yukawa_forces_n3l_soa_batched(Rp: jax.Array, mask_row: jax.Array,
                                  e: int, L: float, ldeb: float,
                                  tile: Optional[int] = None,
                                  interpret: bool = False) -> jax.Array:
    """Job-batched half-pair forces straight from the *folded* lane
    layout: ``Rp [3, E*npad]`` (job blocks contiguous on the ion axis, as
    carried by the ensemble SoA loop) and ``mask_row`` marking real ions —
    ``[1, npad]`` shared across jobs, or ``[E, npad]`` per-job (the
    Poissonian-N ensemble mode, where each member drew its own count as
    in reference init, SpeedUp.cpp:289-348).  Returns ``F [3, E*npad]``."""
    npad = Rp.shape[1] // e
    if tile is None:
        tile = soa_force_tile(npad)
    if npad % tile != 0:
        raise ValueError(f"force tile {tile} does not divide npad {npad}")
    R3 = jnp.swapaxes(Rp.reshape(3, e, npad), 0, 1)       # [E, 3, npad]
    m = (jnp.broadcast_to(mask_row[None], (e, 1, npad))
         if mask_row.shape[0] == 1 else mask_row[:, None, :])
    Rl4 = jnp.concatenate([R3, m.astype(Rp.dtype)], axis=1)
    Rs = jnp.zeros((e, npad, 8), Rp.dtype)
    Rs = Rs.at[:, :, :3].set(jnp.swapaxes(R3, 1, 2))
    Rs = Rs.at[:, :, 3].set(m[:, 0, :])
    F = _yukawa_n3l_batched(Rl4, Rs, L=float(L), ldeb=float(ldeb),
                            tile=tile, interpret=interpret)   # [E, 3, npad]
    return jnp.swapaxes(F, 0, 1).reshape(3, e * npad)


def _yukawa_kernel_rows_cols_batched(xl_ref, ys_ref, f_ref, *, L, ldeb,
                                     rcut2):
    """Force-only batched kernel on a (E, row_tiles, col_tiles) grid where
    the row and column tile counts may differ — the cross-shard force path
    (local ion-shard rows x all-gathered global columns)."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        f_ref[...] = jnp.zeros_like(f_ref)

    fx, fy, fz = _pair_tile_rows(xl_ref[0], ys_ref[0], L, ldeb, rcut2,
                                 with_pot=False)
    f_ref[0, 0, :] += fx
    f_ref[0, 1, :] += fy
    f_ref[0, 2, :] += fz


@functools.partial(jax.jit, static_argnames=("L", "ldeb", "tile",
                                             "interpret"))
def _yukawa_rows_cols_batched(Rl: jax.Array, Rs: jax.Array, *, L: float,
                              ldeb: float, tile: int,
                              interpret: bool = False) -> jax.Array:
    e, _, npr = Rl.shape
    npc = Rs.shape[1]
    grid = (e, npr // tile, npc // tile)
    kern = functools.partial(_yukawa_kernel_rows_cols_batched, L=L,
                             ldeb=ldeb, rcut2=(L / 2.0) ** 2)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tile), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 8), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, tile), lambda b, i, j: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, 3, npr), Rl.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(Rl, Rs)


def yukawa_forces_soa_cols_batched(Rp: jax.Array, cols: jax.Array,
                                   col_mask: jax.Array, e: int, L: float,
                                   ldeb: float, tile: Optional[int] = None,
                                   interpret: bool = False) -> jax.Array:
    """Row forces from the folded lane layout against an explicit column
    set: ``Rp [3, E*npad]`` local ion-shard rows (job blocks contiguous),
    ``cols [E, ncols, 3]`` the source positions (e.g. the all-gathered
    global ion set of each job), ``col_mask`` marking real source ions —
    ``[ncols]`` shared or ``[E, ncols]`` per job (Poissonian-N members).
    Pair forces are full-tile (both ordered pairs evaluated — the
    reaction half lives on another shard), so this costs ~2x the N3L
    kernel per pair but parallelizes the row axis perfectly across shards.
    Padded *row* lanes may accumulate garbage; callers whose padded lanes
    feed back (the Poissonian fold) must zero them with a row mask.
    Returns ``F [3, E*npad]``."""
    npad = Rp.shape[1] // e
    ncols = cols.shape[1]
    if tile is None:
        tile = soa_force_tile(npad)
    if npad % tile or ncols % tile:
        raise ValueError(f"force tile {tile} must divide npad {npad} and "
                         f"ncols {ncols}")
    Rl = jnp.swapaxes(Rp.reshape(3, e, npad), 0, 1)        # [E, 3, npad]
    Rs = jnp.zeros((e, ncols, 8), Rp.dtype).at[:, :, :3].set(cols)
    cm = (col_mask if col_mask.ndim == 2
          else jnp.broadcast_to(col_mask[None], (e, ncols)))
    Rs = Rs.at[:, :, 3].set(cm.astype(Rp.dtype))
    F = _yukawa_rows_cols_batched(Rl, Rs, L=float(L), ldeb=float(ldeb),
                                  tile=tile, interpret=interpret)
    return jnp.swapaxes(F, 0, 1).reshape(3, e * npad)


def _yukawa_cross_n3l_kernel_batched(xl_ref, ys_ref, f_ref, g_ref, *, L,
                                     ldeb, rcut2):
    """Cross-block half-pair kernel: rows and columns are DIFFERENT ion
    blocks (two shards of one member's ion axis), so every (row, col)
    pair is unordered-unique and both sides are paid for at once — row
    sums into ``f_ref``, *negated* column (reaction) sums into the
    per-step buffer ``g_ref``, reduced over the row-tile axis outside.
    This is the kernel under the cross-shard N3L ring schedule
    (parallel/ensemble.ring_n3l_fused_forces), which evaluates each
    cross-shard tile pair once where the gather path's full-tile kernel
    (``_yukawa_kernel_rows_cols_batched``) pays both ordered halves."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        f_ref[...] = jnp.zeros_like(f_ref)

    fx, fy, fz, gx, gy, gz = _half_pair_tile(
        xl_ref[0], ys_ref[0], L=L, ldeb=ldeb, rcut2=rcut2, reaction=True)
    f_ref[0, 0, :] += fx
    f_ref[0, 1, :] += fy
    f_ref[0, 2, :] += fz
    g_ref[0, 0, :, 0] = -gx
    g_ref[0, 0, :, 1] = -gy
    g_ref[0, 0, :, 2] = -gz


@functools.partial(jax.jit, static_argnames=("L", "ldeb", "tile",
                                             "interpret"))
def _yukawa_cross_n3l_batched(Rl4: jax.Array, Rs: jax.Array, *, L: float,
                              ldeb: float, tile: int,
                              interpret: bool = False):
    e, _, npr = Rl4.shape
    npc = Rs.shape[1]
    nti, ntj = npr // tile, npc // tile
    kern = functools.partial(_yukawa_cross_n3l_kernel_batched, L=L,
                             ldeb=ldeb, rcut2=(L / 2.0) ** 2)
    f, g = pl.pallas_call(
        kern,
        grid=(e, nti, ntj),
        in_specs=[
            pl.BlockSpec((1, 4, tile), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 8), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 3, tile), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile, 8),
                         lambda b, i, j: (b, i * ntj + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((e, 3, npr), Rl4.dtype),
            jax.ShapeDtypeStruct((e, nti * ntj, tile, 8), Rl4.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(Rl4, Rs)
    # reduce the per-step reaction rows over the row-tile axis (the grid
    # is a full rectangle, so this is a reshape+sum — no scatter)
    gc = g.reshape(e, nti, ntj, tile, 8).sum(axis=1)
    return f, gc.reshape(e, npc, 8)[:, :, :3]


def yukawa_forces_cross_n3l_soa_batched(Rp: jax.Array, mask_row: jax.Array,
                                        cols: jax.Array, col_mask: jax.Array,
                                        e: int, L: float, ldeb: float,
                                        tile: Optional[int] = None,
                                        interpret: bool = False):
    """Half-pair forces between a folded row block and an explicit column
    block: ``Rp [3, E*npad]`` local rows (job blocks contiguous),
    ``mask_row`` ``[1, npad]``/``[E, npad]``, ``cols [E, npc, 3]`` +
    ``col_mask [E, npc]`` the visiting block (another ion shard of the
    same members, circulated by the ring schedule).  Each (row, col)
    pair is evaluated ONCE; returns ``(F [3, E*npad], G [E, npc, 3])``
    where G is the Newton's-third-law reaction on the column particles
    (to be shipped back to their owner shard).  Padded/masked lanes on
    either side contribute nothing (mask factors in the tile math)."""
    npad = Rp.shape[1] // e
    npc = cols.shape[1]
    if tile is None:
        tile = soa_force_tile(min(npad, npc))
    if npad % tile or npc % tile:
        raise ValueError(f"force tile {tile} must divide npad {npad} and "
                         f"npc {npc}")
    R3 = jnp.swapaxes(Rp.reshape(3, e, npad), 0, 1)       # [E, 3, npad]
    m = (jnp.broadcast_to(mask_row[None], (e, 1, npad))
         if mask_row.shape[0] == 1 else mask_row[:, None, :])
    Rl4 = jnp.concatenate([R3, m.astype(Rp.dtype)], axis=1)
    Rs = jnp.zeros((e, npc, 8), Rp.dtype).at[:, :, :3].set(cols)
    Rs = Rs.at[:, :, 3].set(col_mask.astype(Rp.dtype))
    F, G = _yukawa_cross_n3l_batched(Rl4, Rs, L=float(L),
                                     ldeb=float(ldeb), tile=tile,
                                     interpret=interpret)
    return jnp.swapaxes(F, 0, 1).reshape(3, e * npad), G


def yukawa_forces_n3l_pallas_batched(R: jax.Array, L: float, ldeb: float,
                                     tile: int = 512,
                                     interpret: bool = False) -> jax.Array:
    """[E,N,3] ensemble positions -> forces [E,N,3], half-pair kernel.

    ``ldeb`` may be a per-member [E] jax array (kappa sweeps): each
    member's blocks then carry its own 1/ldeb in the spare ys column."""
    e, n, _ = R.shape
    npad = _round_up(max(n, tile), tile)
    Rl4 = jnp.zeros((e, 4, npad), R.dtype).at[:, :3, :n].set(
        jnp.swapaxes(R, 1, 2)).at[:, 3, :n].set(1.0)
    Rs = jnp.zeros((e, npad, 8), R.dtype).at[:, :n, :3].set(R)
    Rs = Rs.at[:, :n, 3].set(1.0)
    if isinstance(ldeb, jax.Array):
        Rs = Rs.at[:, :, 4].set((1.0 / ldeb).astype(R.dtype)[:, None])
        ldeb_static = None
    else:
        ldeb_static = float(ldeb)
    out = _yukawa_n3l_batched(Rl4, Rs, L=float(L), ldeb=ldeb_static,
                              tile=tile, interpret=interpret)
    return jnp.swapaxes(out[:, :, :n], 1, 2)


@functools.partial(jax.jit, static_argnames=("L", "ldeb", "tile"))
def _yukawa_pallas_batched(Rl: jax.Array, Rs: jax.Array, *, L: float,
                           ldeb: float, tile: int) -> jax.Array:
    """Ensemble-batched kernel: Rl [E,3,Np], Rs [E,Np,8] -> [E,4,Np].
    The ensemble axis becomes the leading (parallel) grid dimension."""
    e, _, npad = Rl.shape
    grid = (e, npad // tile, npad // tile)
    kern = functools.partial(_yukawa_kernel_batched, L=L, ldeb=ldeb,
                             rcut2=(L / 2.0) ** 2)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tile), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 8), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, tile), lambda b, i, j: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, 4, npad), Rl.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(Rl, Rs)


def yukawa_forces_potential_pallas_batched(R: jax.Array, L: float,
                                           ldeb: float, tile: int = 512):
    """[E,N,3] ensemble positions -> (F [E,N,3], pot [E,N])."""
    e, n, _ = R.shape
    npad = _round_up(max(n, tile), tile)
    Rl = jnp.zeros((e, 3, npad), R.dtype).at[:, :, :n].set(
        jnp.swapaxes(R, 1, 2))
    Rs = jnp.zeros((e, npad, 8), R.dtype).at[:, :n, :3].set(R)
    Rs = Rs.at[:, :n, 3].set(1.0)
    out = _yukawa_pallas_batched(Rl, Rs, L=float(L), ldeb=float(ldeb),
                                 tile=tile)
    return jnp.swapaxes(out[:, :3, :n], 1, 2), out[:, 3, :n]


def auto_tile(n: int) -> int:
    """Interaction-tile size: 512 is the VMEM sweet spot — the (TJ, TI)
    pair temporaries are ~8 x tile^2 x 4 B, so 512 uses ~8 MB of the 16 MB
    VMEM while 1024 would overflow it."""
    return 512


def best_forces_fn(n: int, L: float, ldeb: float, mask=None,
                   use_pallas: Optional[bool] = None,
                   tile: Optional[int] = None, n3l: bool = True):
    """Return a ``R -> (F, pot_per_ion)`` callable for the current backend.
    The TPU hot path is the half-pair N3L kernel (force-only; the MD loop
    never needs the potential); ``n3l=False`` falls back to the full-tile
    kernel.  ``ldeb`` may be a traced jax scalar on the n3l and XLA paths
    (per-member kappa sweeps) — the full-tile kernel requires a float."""
    if use_pallas is None:
        use_pallas = _HAS_PALLAS and jax.default_backend() not in ("cpu",)
    if tile is None:
        tile = auto_tile(n)
    if use_pallas:
        if n3l:
            return lambda R: (yukawa_forces_n3l_pallas(R, L, ldeb, mask,
                                                       tile), None)
        return lambda R: yukawa_forces_potential_pallas(R, L, ldeb, mask,
                                                        tile, with_pot=False)
    return lambda R: yukawa_forces_potential(R, L, ldeb, mask)
