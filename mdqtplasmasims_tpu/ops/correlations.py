"""Velocity autocorrelation suite and streaming VAF.

The reference computes VAF and the v^2/v^3/v^4 autocorrelations from a
stored [3][N][T] velocity history with a serial O(T^2 N) post-pass
(MonteCarloFollowedByMDAndTempAnisotropy.cpp:655-807).  Here the same
quantities come from batched FFTs — O(N T log T) — with results identical
up to float associativity:

    C_p[tau] = (1/(N (T-tau))) sum_{n,axis} sum_j s[j] s[j+tau] - const
    with s = v^p;  const = 0 (p=1,3), 3/Gamma^2 (p=2), 27/Gamma^4 (p=4).

Streaming variants (Zfunc/printVAF, laserCooling...SpeedUp.cpp:1100-1130;
x-only randomFrozenStartTag422Linear.cpp:904-927; v^2 "LongKin"
randomFrozenStartTag408Quad.cpp:944-967) are simple dot products against a
saved interval snapshot.
"""

from __future__ import annotations

from typing import Optional

import functools

import jax
import jax.numpy as jnp


def _autocorr_sums(s: jax.Array) -> jax.Array:
    """sum_j s[j] s[j+tau] for tau in [0, T) via FFT.  s: [..., T]."""
    T = s.shape[-1]
    nfft = 2 * T
    f = jnp.fft.rfft(s, n=nfft, axis=-1)
    c = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=-1)[..., :T]
    return c


def power_autocorr(vstore: jax.Array, power: int, gamma: float = 1.0
                   ) -> jax.Array:
    """[T] autocorrelation of v^power from vstore [T, N, 3].

    power=1 -> VAF (recordVAF :655-693); 2 -> longitudinal-viscosity
    autocorr minus 3/Gamma^2 (:695-731); 3 -> v^3 autocorr (:733-769);
    4 -> v^4 autocorr minus 27/Gamma^4 (:771-807)."""
    T, n, _ = vstore.shape
    s = (vstore ** power).transpose(1, 2, 0)        # [N, 3, T]
    c = jnp.sum(_autocorr_sums(s), axis=(0, 1))     # [T]
    denom = n * (T - jnp.arange(T))
    out = c / denom
    if power == 2:
        out = out - 3.0 / gamma ** 2
    elif power == 4:
        out = out - 27.0 / gamma ** 4
    return out


@functools.partial(jax.jit, static_argnames=("gamma",))
def autocorr_suite(vstore: jax.Array, gamma: float = 1.0):
    """All four power autocorrelations (VAF, v^2, v^3, v^4) as ONE
    compiled program — four separate power_autocorr jits cost ~10 s of
    compile each on the remote-compile backend."""
    return tuple(power_autocorr(vstore, k, gamma) for k in (1, 2, 3, 4))


def power_autocorr_direct(vstore: jax.Array, power: int, gamma: float = 1.0
                          ) -> jax.Array:
    """O(T^2) direct evaluation (for validation against the FFT path)."""
    T, n, _ = vstore.shape
    s = vstore ** power
    out = []
    for tau in range(T):
        out.append(jnp.sum(s[:T - tau] * s[tau:]) / (n * (T - tau)))
    res = jnp.stack(out)
    if power == 2:
        res = res - 3.0 / gamma ** 2
    elif power == 4:
        res = res - 27.0 / gamma ** 4
    return res


def streaming_vaf(v_now: jax.Array, v_interval_start: jax.Array,
                  x_only: bool = False,
                  weights: Optional[jax.Array] = None,
                  mask: Optional[jax.Array] = None) -> jax.Array:
    """Zfunc: (1/N) sum_i v_i(t0).v_i(t), optionally x-only and/or
    restricted to a weighted subset (spin-up ions).  ``mask`` marks the
    member's real ions when the arrays carry padded lanes (the
    Poissonian-N fold): N becomes the real count (padded lanes are
    V=0 so they never contribute to the sum)."""
    if x_only:
        prod = v_interval_start * v_now
    else:
        prod = jnp.sum(v_interval_start * v_now, axis=-1)
    if weights is not None:
        prod = prod * weights
    n_eff = v_now.shape[0] if mask is None else jnp.sum(mask)
    return jnp.sum(prod) / n_eff


def streaming_long_kin(vx_now: jax.Array, vx_start: jax.Array,
                       mask: Optional[jax.Array] = None) -> jax.Array:
    """LongKin (randomFrozenStartTag408Quad.cpp:944-967): the v^2
    autocorrelation with the *current* mean-square subtracted:
    (1/N) sum (vx0^2 - <vx^2>)(vx^2 - <vx^2>).  ``mask``: real-ion
    marker for padded folds — both the mean-square and the sum run over
    real lanes only (padded vx=0 lanes would bias <vx^2> low and add
    spurious (0-avg)^2 terms)."""
    vv_now, vv_start = vx_now * vx_now, vx_start * vx_start
    if mask is None:
        avg = jnp.mean(vv_now)
        return jnp.mean((vv_start - avg) * (vv_now - avg))
    n_eff = jnp.sum(mask)
    avg = jnp.sum(vv_now * mask) / n_eff
    return jnp.sum((vv_start - avg) * (vv_now - avg) * mask) / n_eff
