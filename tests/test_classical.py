"""Tests: MC equilibrator, thermostat, tagging, correlations, structure ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdqtplasmasims_tpu.core.mc import MetropolisMC
from mdqtplasmasims_tpu.core.tagging import (
    spin_up_probability_408, spin_up_probability_422, tag_classical,
    tagged_moments)
from mdqtplasmasims_tpu.core.thermostat import (
    anisotropize_velocities, collide_and_kick, laser_force,
    temperature_per_axis)
from mdqtplasmasims_tpu.ops.correlations import (
    power_autocorr, power_autocorr_direct, streaming_long_kin, streaming_vaf)
from mdqtplasmasims_tpu.ops.structure import (
    current_fourier, k_grid, pair_correlation)
from mdqtplasmasims_tpu.ops.yukawa import yukawa_potential


class TestCorrelations:
    @pytest.mark.parametrize("power", [1, 2, 3, 4])
    def test_fft_matches_direct(self, power):
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.normal(size=(40, 7, 3)))
        a = np.array(power_autocorr(v, power, gamma=3.0))
        b = np.array(power_autocorr_direct(v, power, gamma=3.0))
        assert np.abs(a - b).max() < 1e-10

    def test_matches_reference_formula(self):
        """Direct transcription of recordVAF's triple loop."""
        rng = np.random.default_rng(1)
        v = rng.normal(size=(20, 5, 3))
        T, n, _ = v.shape
        ref = np.zeros(T)
        for tau in range(T):
            s = 0.0
            for i in range(n):
                for j in range(T - tau):
                    s += (v[j, i] * v[j + tau, i]).sum()
            ref[tau] = s / (n * (T - tau))
        out = np.array(power_autocorr(jnp.asarray(v), 1))
        assert np.abs(out - ref).max() < 1e-10

    def test_streaming(self):
        rng = np.random.default_rng(2)
        v0 = jnp.asarray(rng.normal(size=(50, 3)))
        v1 = jnp.asarray(rng.normal(size=(50, 3)))
        assert float(streaming_vaf(v1, v0)) == pytest.approx(
            np.mean(np.sum(np.array(v0) * np.array(v1), -1)))
        lk = float(streaming_long_kin(v1[:, 0], v0[:, 0]))
        avg = np.mean(np.array(v1[:, 0]) ** 2)
        ref = np.mean((np.array(v0[:, 0]) ** 2 - avg)
                      * (np.array(v1[:, 0]) ** 2 - avg))
        assert lk == pytest.approx(ref)


class TestStructure:
    def test_gr_matches_numpy(self):
        n, L = 50, 6.0
        rng = np.random.default_rng(3)
        R = rng.uniform(0, L, (n, 3))
        g = np.array(pair_correlation(jnp.asarray(R), L, chunk=16))
        # numpy reference with the reference's shell normalization
        dr = 0.05
        d = R[:, None, :] - R[None, :, :]
        d -= L * np.round(d / L)
        r = np.sqrt((d ** 2).sum(-1))
        nb = int(np.floor((L / 2) / dr))
        hist = np.zeros(400)
        idx = (r / dr).astype(int)
        for i in range(n):
            for j in range(n):
                if i != j and idx[i, j] < nb:
                    hist[idx[i, j]] += 1
        shell = np.array([n * 4 / 3 * np.pi * dr ** 3 if i == 0
                          else n * 3 * dr ** 3 * i * i for i in range(400)])
        ref = np.where(np.arange(400) < nb, hist / shell, 0.0)
        assert np.abs(g - ref).max() < 1e-8

    def test_gr_uniform_is_flat(self):
        n, L = 1000, (1000 * 4 * np.pi / 3) ** (1 / 3)
        rng = np.random.default_rng(4)
        R = rng.uniform(0, L, (n, 3))
        g = np.array(pair_correlation(jnp.asarray(R), L))
        mid = g[40:150]   # away from r=0 noise and the L/2 cutoff (~bin 161)
        assert abs(mid.mean() - 1.0) < 0.05

    def test_lccf_matches_direct(self):
        n, L = 40, 5.0
        rng = np.random.default_rng(5)
        R = rng.uniform(0, L, (n, 3))
        V = rng.normal(size=(n, 3))
        kv = k_grid(L, 4)
        J = np.array(current_fourier(jnp.asarray(R), jnp.asarray(V),
                                     jnp.asarray(kv)))
        ref = np.zeros((3, kv.shape[0]), complex)
        for kidx in range(kv.shape[0]):
            ph = np.exp(1j * R @ kv[kidx])
            for a in range(3):
                ref[a, kidx] = (V[:, a] * ph).sum()
        assert np.abs(J - ref).max() < 1e-8


class TestThermostat:
    def test_anisotropize(self):
        V = jnp.ones((10, 3))
        out = np.array(anisotropize_velocities(V, 0.15))
        assert out[0, 0] == pytest.approx(np.sqrt(1.15))
        assert out[0, 1] == pytest.approx(np.sqrt(1 - 0.075))

    def test_collisions_thermalize(self):
        key = jax.random.PRNGKey(0)
        V = jnp.zeros((20000, 3))
        gamma = 3.0
        out = collide_and_kick(V, key, dt=1.0, collision_freq=0.5,
                               gamma=gamma)
        frac = float(jnp.mean((jnp.abs(out).sum(-1) > 0)))
        assert abs(frac - 0.5) < 0.02
        resampled = np.array(out)[np.abs(np.array(out)).sum(-1) > 0]
        assert abs(resampled.var() - 1 / gamma) < 0.02

    def test_laser_force_balanced(self):
        V = jnp.asarray(np.random.default_rng(0).normal(size=(100, 3)))
        out = laser_force(V, dt=0.005, beta=26000.0, density=0.4)
        c = 0.005 * 1.234e-6 * 26000 / np.sqrt(0.4)
        ref = np.array(V) * (1 + np.array([c / 2, -c / 4, -c / 4]))
        assert np.abs(np.array(out) - ref).max() < 1e-12


class TestTagging:
    def test_classical_probabilities(self):
        gamma = 3.0
        vt = np.sqrt(1 / gamma)
        vx = jnp.full((200000,), 0.5 * vt)
        t1, t2, t3, t4 = tag_classical(vx, jax.random.PRNGKey(0), gamma)
        assert float(jnp.mean(t1)) == pytest.approx(0.5 + 0.5 / 6, abs=0.01)
        assert float(jnp.mean(t2)) == pytest.approx(0.5 / 9 * 0.25, abs=0.005)
        assert float(jnp.mean(t3)) == pytest.approx(0.5 + 0.5 / 27 * 0.125,
                                                    abs=0.01)
        assert float(jnp.mean(t4)) == pytest.approx(0.5 / 81 * 0.0625,
                                                    abs=0.005)

    def test_classical_saturation(self):
        gamma = 3.0
        vt = np.sqrt(1 / gamma)
        vx = jnp.asarray([4 * vt, -4 * vt])
        t1, t2, t3, t4 = tag_classical(vx, jax.random.PRNGKey(1), gamma)
        assert bool(t1[0]) and not bool(t1[1])
        assert bool(t3[0]) and not bool(t3[1])

    def test_projective_probabilities(self):
        psi = jnp.zeros((4, 7), jnp.complex128)
        psi = psi.at[0, 0].set(1.0)    # S -1/2 -> always up (408)
        psi = psi.at[1, 3].set(1.0)    # P +1/2 -> 2/3
        psi = psi.at[2, 4].set(1.0)    # P -1/2 -> 1/3
        psi = psi.at[3, 6].set(1.0)    # D -> never
        p = np.array(spin_up_probability_408(psi))
        assert np.allclose(p, [1.0, 2 / 3, 1 / 3, 0.0])

        psi5 = jnp.zeros((3, 5), jnp.complex128)
        psi5 = psi5.at[0, 0].set(1.0)
        psi5 = psi5.at[1, 2].set(1.0)
        psi5 = psi5.at[2, 3].set(1.0)
        p5 = np.array(spin_up_probability_422(psi5))
        assert np.allclose(p5, [1.0, 1 / 3, 2 / 3])

    def test_tagged_moments(self):
        vx = jnp.asarray([1.0, 2.0, 3.0, 4.0])
        tags = jnp.asarray([True, False, True, False])
        m = np.array(tagged_moments(vx, tags))
        assert np.allclose(m, [2.0, 5.0, 14.0, 41.0])


class TestMonteCarlo:
    def test_mc_lowers_energy_and_builds_correlation_hole(self):
        n, gamma, kappa = 64, 10.0, 0.5
        L = (n * 4 * np.pi / 3) ** (1 / 3)
        mc = MetropolisMC(L=L, ldeb=1 / kappa, gamma=gamma)
        key = jax.random.PRNGKey(0)
        R = jax.random.uniform(key, (n, 3), jnp.float64, 0, L)
        ep0 = float(yukawa_potential(R, L, 1 / kappa))
        R2, acc = mc.run(R, jax.random.PRNGKey(1), 5000)
        ep1 = float(yukawa_potential(R2, L, 1 / kappa))
        assert ep1 < ep0
        assert 0.05 < float(acc) / 5000 < 0.99
        g = np.array(pair_correlation(R2, L, chunk=32))
        assert g[:8].max() < 0.5   # correlation hole at small r

    def test_mc_detailed_balance_roundtrip(self):
        """At very high temperature (gamma->0) acceptance -> 1."""
        n = 27
        L = (n * 4 * np.pi / 3) ** (1 / 3)
        mc = MetropolisMC(L=L, ldeb=2.0, gamma=1e-6)
        R = jax.random.uniform(jax.random.PRNGKey(2), (n, 3), jnp.float64,
                               0, L)
        _, acc = mc.run(R, jax.random.PRNGKey(3), 1000)
        assert float(acc) / 1000 > 0.99


def test_autocorr_suite_matches_singles():
    """The bundled one-compile suite equals the four separate calls."""
    from mdqtplasmasims_tpu.ops.correlations import (autocorr_suite,
                                                     power_autocorr)
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.normal(size=(50, 16, 3)))
    suite = autocorr_suite(v, 3.0)
    for k, s in zip((1, 2, 3, 4), suite):
        np.testing.assert_allclose(np.asarray(s),
                                   np.asarray(power_autocorr(v, k, 3.0)),
                                   rtol=1e-12)
