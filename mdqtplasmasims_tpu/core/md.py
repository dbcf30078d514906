"""Classical MD integrators: leapfrog (cooling family) and velocity-Verlet
(MC transport family), with periodic-boundary re-insertion.

References:
  leapfrog split steps step_R/step_V/step —
    laserCoolingPlusExpansionMDQTSpeedUp.cpp:356-430
  velocity-Verlet stepPositions/stepVelocities/MDStep —
    MonteCarloFollowedByMDAndTempAnisotropy.cpp:452-511
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def wrap_pbc(R: jax.Array, L: float) -> jax.Array:
    """Pac-man re-insertion after a drift (laserCooling...SpeedUp.cpp:381-389).

    The reference applies a single +-L shift, not a modulo; replicated here
    (a particle can only exit by less than L per step)."""
    R = jnp.where(R < 0, R + L, R)
    R = jnp.where(R > L, R - L, R)
    return R


def step_R(R, V, F, dt_half, L, first_step):
    """Half drift.  On the very first step (t == 0) the reference uses the
    2nd-order form R += dt*V + dt^2*F (laserCooling...SpeedUp.cpp:370-378)."""
    drift = dt_half * V
    drift2 = drift + (dt_half * dt_half) * F
    R = R + jnp.where(first_step, drift2, drift)
    return wrap_pbc(R, L)


def leapfrog_substep(R, V, F, dt, L, first_step=False):
    """One kick-drift-kick leapfrog step with *fixed* forces F
    (laserCooling...SpeedUp.cpp:418-430: forces are refreshed outside, once
    per full MD step; drift/kick run at the quantum substep dt)."""
    R = step_R(R, V, F, 0.5 * dt, L, first_step)
    V = V + dt * F
    R = step_R(R, V, F, 0.5 * dt, L, first_step)
    return R, V


def velocity_verlet_step(R, V, A, dt, L, forces_fn: Callable):
    """MDStep of the MC family (MonteCarlo...TempAnisotropy.cpp:504-511):
    R += dt*V + dt^2/2*A; wrap; A' = forces(R); V += dt/2*(A + A')."""
    R = wrap_pbc(R + dt * V + 0.5 * dt * dt * A, L)
    A_new = forces_fn(R)
    V = V + 0.5 * dt * (A + A_new)
    return R, V, A_new


def kinetic_energies(V: jax.Array, subtract_mean_vx: bool = False,
                     mask: Optional[jax.Array] = None):
    """Per-axis mean kinetic energies (output():930-947).  In the expansion
    frame the x-axis subtracts the ensemble-mean vx."""
    if mask is None:
        n = V.shape[0]
        vx_mean = jnp.mean(V[:, 0])
        Vx = V[:, 0] - jnp.where(subtract_mean_vx, vx_mean, 0.0)
        ek = [jnp.mean(0.5 * Vx ** 2),
              jnp.mean(0.5 * V[:, 1] ** 2),
              jnp.mean(0.5 * V[:, 2] ** 2)]
    else:
        n_eff = jnp.sum(mask)
        vx_mean = jnp.sum(V[:, 0] * mask) / n_eff
        Vx = V[:, 0] - jnp.where(subtract_mean_vx, vx_mean, 0.0)
        ek = [jnp.sum(0.5 * Vx ** 2 * mask) / n_eff,
              jnp.sum(0.5 * V[:, 1] ** 2 * mask) / n_eff,
              jnp.sum(0.5 * V[:, 2] ** 2 * mask) / n_eff]
    return ek[0], ek[1], ek[2], vx_mean
