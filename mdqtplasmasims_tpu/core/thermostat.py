"""Collision thermostat and temperature-anisotropy drivers.

References (MonteCarloFollowedByMDAndTempAnisotropy.cpp):
  collision resample inside stepVelocities  :469-502
  anisotropizeVelocities                    :548-558
  anisotropic heating/cooling force (beta)  :488-498, constants :96-107
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def collide_and_kick(V_verlet: jax.Array, key: jax.Array, *, dt: float,
                     collision_freq: float, gamma: float) -> jax.Array:
    """Collision branch of stepVelocities: with probability
    ``dt*collision_freq`` a particle's velocity is *replaced* by a fresh
    MB draw (spread sqrt(1/Gamma)) instead of the Verlet update."""
    if collision_freq == 0.0:
        return V_verlet
    n = V_verlet.shape[0]
    kroll, kv = jax.random.split(key)
    coll = jax.random.uniform(kroll, (n,)) < dt * collision_freq
    fresh = jax.random.normal(kv, (n, 3), V_verlet.dtype) * jnp.sqrt(1.0 / gamma)
    return jnp.where(coll[:, None], fresh, V_verlet)


def laser_force(V: jax.Array, *, dt: float, beta: float, density: float,
                one_axis_only: bool = False) -> jax.Array:
    """Anisotropic heating/cooling force: dv = v*dt*1.234e-6*beta/sqrt(n)
    applied on x only, or energy-balanced (+1/2 on x, -1/4 on y,z)
    (MonteCarlo...cpp:488-498)."""
    c = dt * 1.234e-6 * beta / jnp.sqrt(density)
    if one_axis_only:
        scale = jnp.array([1.0, 0.0, 0.0], V.dtype) * c
    else:
        scale = jnp.array([0.5, -0.25, -0.25], V.dtype) * c
    return V + V * scale[None, :]


def anisotropize_velocities(V: jax.Array, temp_percent_diff: float) -> jax.Array:
    """Instantaneous rescale: x by sqrt(1+d), y/z by sqrt(1-d/2)
    (MonteCarlo...cpp:548-558)."""
    s = jnp.array([jnp.sqrt(1.0 + temp_percent_diff),
                   jnp.sqrt(1.0 - temp_percent_diff / 2.0),
                   jnp.sqrt(1.0 - temp_percent_diff / 2.0)], V.dtype)
    return V * s[None, :]


def temperature(V: jax.Array) -> jax.Array:
    """<v^2> over all components (recordTemperature, :525-546)."""
    return jnp.mean(V * V)


def temperature_per_axis(V: jax.Array) -> jax.Array:
    """[3] per-axis <v_a^2> (recordTempForEachAxis, :560-581)."""
    return jnp.mean(V * V, axis=0)
