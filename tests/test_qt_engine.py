"""QT engine validation: master-equation agreement, norm conservation,
jump statistics, level-scheme table invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdqtplasmasims_tpu.levels import (
    LevelScheme, sr12_cooling, tag408, tag422, three_state, with_recoil)
from mdqtplasmasims_tpu.core.qt import QTEngine, random_s_superposition


def lindblad_rk4(scheme: LevelScheme, v: float, dt: float, nsteps: int,
                 rho0=None, gamma_e: float = 1.0, coupling_extra=None):
    """Direct density-matrix integration of the same model (numpy, f64)."""
    S = scheme.n_states
    H = np.diag(scheme.e0 + scheme.e1 * v).astype(complex) + scheme.coupling
    if coupling_extra is not None:
        H = H + coupling_extra
    # jump operators: sqrt(rate) |dest><src| reconstructed from decay_w and
    # the destination table (branch-combined)
    Ls = []
    for src in scheme.jump_src:
        w = scheme.decay_w[src]
        pd = scheme.branch_d_prob
        for br, brp in ((0, 1 - pd), (1, pd)):
            for dest in range(S):
                p = scheme.jump_dest[src, br, dest]
                if p > 0:
                    Lk = np.zeros((S, S))
                    Lk[dest, src] = np.sqrt(w * brp * p)
                    Ls.append(Lk)
    rho = np.zeros((S, S), complex)
    if rho0 is None:
        rho[0, 0] = 1.0
    else:
        rho = rho0.copy()

    def drho(r):
        out = -1j * (H @ r - r @ H)
        for L in Ls:
            out += L @ r @ L.T - 0.5 * (L.T @ L @ r + r @ L.T @ L)
        return out

    pops = []
    h = dt * gamma_e
    for _ in range(nsteps):
        k1 = drho(rho); k2 = drho(rho + h / 2 * k1)
        k3 = drho(rho + h / 2 * k2); k4 = drho(rho + h * k3)
        rho = rho + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        pops.append(np.diag(rho).real.copy())
    return np.array(pops)


def run_trajectories(scheme, v, dt, nsteps, n_traj, seed=0, **eng_kw):
    eng = QTEngine(scheme, h=dt, dt_plasma=dt, plas_to_quant_vel=1.0,
                   gamma_to_einstein=1.0, apply_force=False, **eng_kw)
    psi = jnp.zeros((n_traj, scheme.n_states), jnp.complex128).at[:, 0].set(1.0)
    vx = jnp.full((n_traj,), v, jnp.float64)
    tp = jnp.zeros((n_traj,), jnp.float64)

    def body(c, _):
        psi, vx, tp, key = c
        key, sub = jax.random.split(key)
        psi, vx, tp = eng.step(psi, vx, tp, sub)
        return (psi, vx, tp, key), jnp.mean(jnp.abs(psi) ** 2, axis=0)

    (_, _, _, _), pops = jax.lax.scan(
        body, (psi, vx, tp, jax.random.PRNGKey(seed)), None, length=nsteps)
    return np.array(pops)


class TestMasterEquationAgreement:
    def test_three_state(self):
        scheme = three_state(-0.5, 0.5)
        pops = run_trajectories(scheme, v=0.3, dt=0.01, nsteps=1500, n_traj=3000)
        me = lindblad_rk4(scheme, v=0.3, dt=0.01, nsteps=1500)
        assert np.max(np.abs(pops[300:] - me[300:])) < 0.03

    def test_tag422(self):
        scheme = tag422(-1.0, 1.3)
        pops = run_trajectories(scheme, v=0.5, dt=0.01, nsteps=1200, n_traj=3000)
        me = lindblad_rk4(scheme, v=0.5, dt=0.01, nsteps=1200)
        # pumping scheme: S populations redistribute, D accumulates
        assert np.max(np.abs(pops[200:] - me[200:])) < 0.04

    def test_tag408_quad(self):
        scheme = tag408(0.0, 2.0, linear=False)
        pops = run_trajectories(scheme, v=0.2, dt=0.01, nsteps=1000, n_traj=3000)
        me = lindblad_rk4(scheme, v=0.2, dt=0.01, nsteps=1000)
        assert np.max(np.abs(pops[200:] - me[200:])) < 0.04

    def test_tag408_linear(self):
        """The 7-state LINEAR coupling (4 counter-propagating sigma
        channels, randomFrozenStartTag408Linear.cpp:438) at its reference
        operating point (det=-2.5, Om=0.7)."""
        scheme = tag408(-2.5, 0.7, linear=True)
        pops = run_trajectories(scheme, v=0.4, dt=0.01, nsteps=1000,
                                n_traj=3000)
        me = lindblad_rk4(scheme, v=0.4, dt=0.01, nsteps=1000)
        assert np.max(np.abs(pops[200:] - me[200:])) < 0.04

    @pytest.mark.slow
    def test_sr12(self):
        scheme = sr12_cooling(-1.0, 1.0, 1.0, 1.0)
        pops = run_trajectories(scheme, v=0.1, dt=0.01, nsteps=1500, n_traj=2000)
        me = lindblad_rk4(scheme, v=0.1, dt=0.01, nsteps=1500)
        # NOTE: the sr12 time-dependent channels are dropped in the ME
        # comparison (they average out for the populations on this
        # timescale); allow a looser tolerance.
        assert np.max(np.abs(pops[300:] - me[300:])) < 0.06


class TestInvariants:
    @pytest.mark.parametrize("scheme_fn", [
        lambda: sr12_cooling(), lambda: tag408(-2.5, 0.7, True),
        lambda: tag408(0.0, 2.0, False), lambda: tag422(), lambda: three_state()])
    def test_tables(self, scheme_fn):
        s = scheme_fn()
        S = s.n_states
        assert s.decay_w.shape == (S,)
        assert np.allclose(s.coupling, s.coupling.conj().T)  # Hermitian
        # destination tables are normalized distributions for source states
        for src in s.jump_src:
            for br in range(2):
                tot = s.jump_dest[src, br].sum()
                if tot > 0:
                    assert abs(tot - 1.0) < 1e-12
        # every P state decays at total rate (1 + branching ratio)
        if s.name != "three_state":
            for src in s.jump_src:
                assert s.decay_w[src] == pytest.approx(
                    1.0 + s.branch_d_prob / (1 - s.branch_d_prob), rel=1e-10)

    def test_norm_conservation_nojump(self):
        """The (1-dp)^(-1/2) renormalized propagator keeps ||psi|| ~ 1."""
        scheme = tag422()
        eng = QTEngine(scheme, h=0.01, dt_plasma=0.01, apply_force=False)
        key = jax.random.PRNGKey(3)
        psi = random_s_superposition(key, 64, scheme.n_states, jnp.complex128)
        vx = jnp.linspace(-1, 1, 64)
        tp = jnp.zeros((64,))

        def body(c, i):
            psi, vx, tp = c
            # fold_in a key that never triggers jumps: use rolls via a key
            # whose uniform[0] is ~U(0,1); jumps are rare at these rates
            psi, vx, tp = eng.step(psi, vx, tp, jax.random.fold_in(key, i))
            return (psi, vx, tp), jnp.sum(jnp.abs(psi) ** 2, axis=-1)

        (_, _, _), norms = jax.lax.scan(body, (psi, vx, tp), jnp.arange(500))
        # the renormalized propagator is norm-preserving only to O(h^2) per
        # step (9e-9 at h=0.01); the deviation compounds multiplicatively
        # between jumps — same behavior as the reference, which ships an
        # optional explicit renormalization flag for exactly this reason
        # (laserCoolingPlusExpansionMDQTSpeedUp.cpp:74,706-712).
        assert np.abs(np.array(norms) - 1.0).max() < 2e-2

    def test_jump_rate_matches_dp(self):
        """Empirical jump frequency ~ dp for a pure excited-state start."""
        scheme = three_state()
        eng = QTEngine(scheme, h=0.002, dt_plasma=0.002, apply_force=False)
        n = 20000
        psi = jnp.zeros((n, 3), jnp.complex128).at[:, 1].set(1.0)
        vx = jnp.zeros((n,))
        tp = jnp.ones((n,))
        psi2, _, tp2 = eng.step(psi, vx, tp, jax.random.PRNGKey(0))
        jumped = np.array(tp2) == 0.0
        # dp = h * w_1 = 0.002
        rate = jumped.mean()
        assert abs(rate - 0.002) < 4 * np.sqrt(0.002 / n)

    def test_recoil_sign_symmetric(self):
        scheme = three_state()
        eng = QTEngine(scheme, h=0.01, dt_plasma=0.01, apply_force=True)
        n = 20000
        psi = jnp.zeros((n, 3), jnp.complex128).at[:, 1].set(1.0)
        vx = jnp.zeros((n,))
        tp = jnp.zeros((n,))
        _, vx2, tp2 = eng.step(psi, vx, tp, jax.random.PRNGKey(1))
        jumped = np.array(tp2) == 0.0
        kicks = np.array(vx2)[jumped]
        assert np.all(np.abs(np.abs(kicks) - scheme.kick_s) < 1e-12)
        # random sign
        assert 0.4 < (kicks > 0).mean() < 0.6

    def test_deterministic(self):
        scheme = tag422()
        eng = QTEngine(scheme, h=0.01, dt_plasma=0.01, apply_force=False)
        psi = random_s_superposition(jax.random.PRNGKey(0), 32, 5, jnp.complex128)
        vx = jnp.linspace(-1, 1, 32)
        tp = jnp.zeros((32,))
        a = eng.step(psi, vx, tp, jax.random.PRNGKey(7))
        b = eng.step(psi, vx, tp, jax.random.PRNGKey(7))
        for x, y in zip(a, b):
            assert np.array_equal(np.array(x), np.array(y))


class TestRandomSuperposition:
    def test_distribution(self):
        psi = random_s_superposition(jax.random.PRNGKey(0), 50000, 12,
                                     jnp.complex128)
        pop = np.abs(np.array(psi)) ** 2
        # only the two S states populated, mean 1/2 each, normalized
        assert pop[:, 2:].max() == 0.0
        assert np.allclose(pop.sum(-1), 1.0, atol=1e-12)
        assert abs(pop[:, 0].mean() - 0.5) < 0.01
