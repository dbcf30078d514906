"""System initializers.

1. Frozen-gas random cell: uniform positions in the L^3 cell with a
   Poissonian particle count around N0, zero velocities, random S-manifold
   superposition wavefunctions (laserCoolingPlusExpansionMDQTSpeedUp.cpp:289-348).
2. Cubic lattice + Maxwell-Boltzmann velocities (MC transport family,
   MonteCarloFollowedByMDAndTempAnisotropy.cpp:173-203).

The reference samples ions from a 9L box and keeps the ones landing in
the cell, giving a run-dependent N; ``exact_n=False`` reproduces that by
drawing N ~ Binomial(N9L, 1/729) on the *host* (so the array shape is
static within the run, but differs run-to-run — each distinct N compiles
its own program and such states cannot be stacked into an ensemble).
``exact_n=True`` (default) pins N = N0 so ensembles vmap and programs are
shared across jobs.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..units import PlasmaUnits


def sample_cell_count(rng: np.random.Generator, n0: int) -> int:
    """Number of ions falling in the unit cell when N9L = 729*N0 candidates
    are scattered over a 9L box (laserCooling...SpeedUp.cpp:299-308)."""
    L = PlasmaUnits.box_length(n0)
    n9l = int(9.0 ** 3 * L ** 3 * 3.0 / (4.0 * math.pi))  # = 729*N0
    return int(rng.binomial(n9l, 1.0 / 729.0))            # p = L^3/(9L)^3


def frozen_gas_positions(key: jax.Array, n: int, L: float,
                         dtype=jnp.float32) -> jax.Array:
    """n uniform positions in (0, L)^3."""
    return jax.random.uniform(key, (n, 3), dtype, minval=0.0, maxval=L)


def poisson_member_mask(n0: int, n_members: int, seed: int,
                        round_to: int = 1):
    """[E, n_arr] real-ion mask with per-member Poissonian counts — the
    fixed-shape ensemble fold's stand-in for the reference's per-job
    init draw (one ``sample_cell_count`` per array job).  ``round_to``
    rounds the padded lane count up so a sharded ion axis divides
    evenly.  Returns ``(mask float32 ndarray, counts list)``."""
    rng = np.random.default_rng(seed)
    n_js = [sample_cell_count(rng, n0) for _ in range(n_members)]
    n_arr = -(-max(n_js) // round_to) * round_to
    m = np.zeros((n_members, n_arr), np.float32)
    for j, nj in enumerate(n_js):
        m[j, :nj] = 1.0
    return m, n_js


def frozen_gas_init(key: jax.Array, n0: int, *, n_states: int = 0,
                    exact_n: bool = True, dtype=jnp.float32,
                    seed_for_count: Optional[int] = None):
    """Positions, velocities(=0), wavefunctions for a frozen-gas start.

    Returns (R, V, psi, n_actual) with arrays sized to ``n_actual``.  With
    ``exact_n`` the count is pinned to n0 (recommended: vmappable, one
    compiled program); otherwise it is Binomial about n0 as in the
    reference, drawn on the host so shapes stay static within the run.
    """
    from .qt import random_s_superposition

    L = PlasmaUnits.box_length(n0)
    if exact_n:
        n = n0
    else:
        rng = np.random.default_rng(seed_for_count)
        n = sample_cell_count(rng, n0)

    # jitted so no eager (esp. complex) ops hit quirky backends
    @partial(jax.jit, static_argnames=("n", "n_states"))
    def build(key, n, n_states):
        kr, kp = jax.random.split(key)
        R = frozen_gas_positions(kr, n, L, dtype)
        V = jnp.zeros((n, 3), dtype)
        psi = None
        if n_states:
            cdtype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128
            psi = random_s_superposition(kp, n, n_states, cdtype)
        return R, V, psi

    R, V, psi = build(key, n, n_states)
    return R, V, psi, n


def lattice_init(key: jax.Array, n: int, gamma: float, L: float,
                 dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """Cubic lattice positions + MB velocities with spread sqrt(1/Gamma)
    (MonteCarloFollowedByMDAndTempAnisotropy.cpp:173-203).  ``n`` must be a
    perfect cube."""
    side = round(n ** (1.0 / 3.0))
    if side ** 3 != n:
        raise ValueError(f"lattice_init needs a cubic N, got {n}")
    idx = jnp.arange(side, dtype=dtype)
    ii, jj, kk = jnp.meshgrid(idx, idx, idx, indexing="ij")
    spacing = L / side
    R = jnp.stack([ii.ravel() * spacing + 0.5,
                   jj.ravel() * spacing + 0.5,
                   kk.ravel() * spacing + 0.5], axis=-1)
    V = jax.random.normal(key, (n, 3), dtype) * jnp.sqrt(1.0 / gamma).astype(dtype)
    return R, V


def mb_velocities(key: jax.Array, n: int, sigma: float,
                  dtype=jnp.float32) -> jax.Array:
    """Maxwell-Boltzmann velocities with per-axis spread sigma."""
    return jax.random.normal(key, (n, 3), dtype) * jnp.asarray(sigma, dtype)
