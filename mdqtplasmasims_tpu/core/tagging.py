"""Velocity tagging: classical moment-based and quantum projective.

References:
  classical 4-power tagging   MonteCarloFollowedByMDAndTempAnisotropy.cpp:810-921
  projective 408 tagging      MonteCarloFollowedByQTTagging408Quad.cpp:1021-1066
  projective 422 measurement  randomFrozenStartTag422Linear.cpp:568-627
  tagged-moment recorders     MonteCarlo...cpp:923-1028, 408Quad:1068-1141
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def tag_classical(vx: jax.Array, key: jax.Array, gamma: float):
    """The four classical taggings with P(tag) ~ 1/2 + c_k (vx/vT)^k.

    Returns (tag1, tag2, tag3, tag4) boolean arrays.  Odd powers saturate
    to tagged/untagged beyond +-3 vT; even powers fall back to a fair coin
    there (MonteCarlo...cpp:810-921)."""
    vt = jnp.sqrt(1.0 / gamma)
    n = vx.shape[0]
    r1, r2, r3, r4 = jax.random.uniform(key, (4, n))
    x = vx / vt
    inside = jnp.abs(x) < 3.0

    p1 = 0.5 + x / 6.0
    tag1 = jnp.where(inside, r1 < p1, x > 3.0)

    p2 = 0.5 / 9.0 * x * x
    tag2 = jnp.where(inside, r2 < p2, r2 >= 0.5)

    p3 = 0.5 + 0.5 / 27.0 * x ** 3
    tag3 = jnp.where(inside, r3 < p3, x > 3.0)

    p4 = 0.5 / 81.0 * x ** 4
    tag4 = jnp.where(inside, r4 < p4, r4 >= 0.5)
    return tag1, tag2, tag3, tag4


def spin_up_probability_408(psi: jax.Array) -> jax.Array:
    """P(measure spin-up) for the 7-state 408 scheme: |1> and |3> count
    fully, |4> with weight 2/3, |5> with 1/3 (C-G weights of the P3/2
    sublevels; MonteCarlo...408Quad.cpp:1026-1062)."""
    pop = jnp.abs(psi) ** 2
    return pop[:, 0] + pop[:, 2] + (2. / 3) * pop[:, 3] + (1. / 3) * pop[:, 4]


def spin_up_probability_422(psi: jax.Array) -> jax.Array:
    """P(spin-up) for the 5-state 422 scheme: |1> fully, |3> with 1/3,
    |4> with 2/3 (randomFrozenStartTag422Linear.cpp:568-610)."""
    pop = jnp.abs(psi) ** 2
    return pop[:, 0] + (1. / 3) * pop[:, 2] + (2. / 3) * pop[:, 3]


def projective_tag(psi: jax.Array, key: jax.Array, scheme_name: str) -> jax.Array:
    """Single projective measurement: tag ~ Bernoulli(P(spin-up))."""
    if scheme_name.startswith("tag408"):
        p = spin_up_probability_408(psi)
    elif scheme_name.startswith("tag422"):
        p = spin_up_probability_422(psi)
    else:
        raise ValueError(scheme_name)
    return jax.random.uniform(key, p.shape) < p


def tagged_moments(vx: jax.Array, tags: jax.Array,
                   subtract_equilibrium: bool = False,
                   gamma: float = 1.0) -> jax.Array:
    """[4] first..fourth moments of the tagged subset's vx.  The pure-MD
    recorder subtracts the equilibrium values 1/Gamma (2nd) and 3/Gamma^2
    (4th) (MonteCarlo...cpp:972-998); the tagging files do not."""
    w = tags.astype(vx.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    m = jnp.stack([jnp.sum(w * vx ** k) / n for k in (1, 2, 3, 4)])
    if subtract_equilibrium:
        m = m - jnp.array([0.0, 1.0 / gamma, 0.0, 3.0 / gamma ** 2], vx.dtype)
    return m
