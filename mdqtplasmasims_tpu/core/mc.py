"""Metropolis Monte Carlo equilibrator for the Yukawa OCP.

Reference: MonteCarloFollowedByMDAndTempAnisotropy.cpp:315-382
(``MonteCarloStep``), duplicated in the MC-tagging family.  Single-particle
trial moves uniform in a sphere of radius ``max_r_step``; acceptance by the
Boltzmann factor.  The reference tracks per-particle energies U[i]
incrementally and computes the *double-counted* difference
``sum_i (U[i]_new - U[i]_old) = 2 dU`` then accepts with
``exp(-(diff/2)*Gamma)`` (line 355) — i.e. physically ``exp(-dU*Gamma)``;
we compute the single-counted ``dU`` row directly, one O(N) vector op per
step, scanned fully on device.

The chain is inherently sequential (each accept changes the landscape for
the next move), matching the reference exactly in distribution; throughput
comes from the vectorized dU row, not from parallel proposals.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .md import wrap_pbc


def _pair_u_row(Rx, Ry, Rz, px, py, pz, L, ldeb, rcut2, self_idx):
    """Yukawa potential of point p against all particles (self masked)."""
    dx = px - Rx
    dy = py - Ry
    dz = pz - Rz
    dx -= L * jnp.round(dx / L)
    dy -= L * jnp.round(dy / L)
    dz -= L * jnp.round(dz / L)
    r2 = dx * dx + dy * dy + dz * dz
    n = Rx.shape[0]
    valid = (r2 < rcut2) & (jnp.arange(n) != self_idx)
    r = jnp.sqrt(jnp.where(valid, r2, 1.0))
    return jnp.where(valid, jnp.exp(-r / ldeb) / r, 0.0)


@dataclasses.dataclass(frozen=True)
class MetropolisMC:
    L: float
    ldeb: float          # 1/kappa
    gamma: float
    max_r_step: float = 0.3   # MonteCarlo...cpp:81

    def sphere_move(self, key) -> jax.Array:
        """Uniform displacement inside a sphere of radius max_r_step."""
        kd, kr = jax.random.split(key)
        d = jax.random.normal(kd, (3,))
        d = d / jnp.linalg.norm(d)
        u = jax.random.uniform(kr)
        return d * self.max_r_step * u ** (1.0 / 3.0)

    def step(self, carry, key):
        """One Metropolis step.  carry = (R [N,3], accept_count)."""
        R, n_acc = carry
        rcut2 = (self.L / 2.0) ** 2
        kp, km, ka = jax.random.split(key, 3)
        n = R.shape[0]
        i = jax.random.randint(kp, (), 0, n)
        move = self.sphere_move(km).astype(R.dtype)
        old = R[i]
        new = wrap_pbc(old + move, self.L)
        Rx, Ry, Rz = R[:, 0], R[:, 1], R[:, 2]
        u_old = jnp.sum(_pair_u_row(Rx, Ry, Rz, old[0], old[1], old[2],
                                    self.L, self.ldeb, rcut2, i))
        u_new = jnp.sum(_pair_u_row(Rx, Ry, Rz, new[0], new[1], new[2],
                                    self.L, self.ldeb, rcut2, i))
        du = u_new - u_old
        accept = (du < 0) | (jax.random.uniform(ka) < jnp.exp(-du * self.gamma))
        R = R.at[i].set(jnp.where(accept, new, old))
        return (R, n_acc + accept.astype(jnp.int32)), None

    def run(self, R: jax.Array, key: jax.Array, n_steps: int
            ) -> Tuple[jax.Array, jax.Array]:
        """Scan n_steps Metropolis moves.  Returns (R, n_accepted)."""
        keys = jax.random.split(key, n_steps)
        (R, n_acc), _ = jax.lax.scan(self.step, (R, jnp.zeros((), jnp.int32)),
                                     keys)
        return R, n_acc
