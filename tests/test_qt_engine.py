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
        # The time-dependent beat-note channels are dropped here because
        # the per-ion clock resets at jumps make the exact ensemble
        # equation clock-resolved (no plain Lindblad form exists); they
        # are verified *deterministically* at 1e-12 — including resets —
        # by TestReferenceTranscription below.
        assert np.max(np.abs(pops[300:] - me[300:])) < 0.06


class TestReferenceTranscription:
    """Deterministic parity with a literal numpy transcription of the
    reference's 12-state qstep (tests/reference_qstep.py) — including the
    time-dependent D->P beat-note channels the master-equation tests drop
    (VERDICT round-1 item 2)."""

    # flagship-like constants (qt_units_408(2.0) magnitudes)
    QDT, G2E, P2Q = 8e-5, 123.1, 1.327
    VKICK, VKICKDP, DR = 9.1e-4, 3.6e-4, 0.0617
    DET, DETDP, OM, OMDP = -1.0, 1.0, 1.0, 1.0

    def _engine(self, renormalize=False):
        scheme = with_recoil(
            sr12_cooling(self.DET, self.DETDP, self.OM, self.OMDP,
                         decay_ratio=self.DR),
            kick_s=self.VKICK, kick_d=self.VKICKDP)
        eng = QTEngine(scheme, h=self.QDT * self.G2E, dt_plasma=self.QDT,
                       plas_to_quant_vel=self.P2Q,
                       gamma_to_einstein=self.G2E, apply_force=True,
                       renormalize=renormalize)
        return scheme, eng

    def test_sr12_hpsi_matches_reference_hamiltonian(self):
        """H(u, t)·psi == the literal SpeedUp.cpp:505-521 Hamiltonian at
        1e-12, over a grid of (velocity, particle clock, expansion
        detuning) points — pins the beat-note phase convention exactly."""
        from reference_qstep import hamiltonian
        from mdqtplasmasims_tpu.core.qt import _params

        scheme, eng = self._engine()
        p = _params(scheme, jnp.float64, jnp.complex128)
        rng = np.random.default_rng(0)
        for _ in range(25):
            v = rng.uniform(-1.5, 1.5)
            t_part = rng.uniform(0.0, 5.0)
            exp_det = rng.uniform(-0.3, 0.3)
            psi = rng.normal(size=(12, 3)) + 1j * rng.normal(size=(12, 3))
            u = v * self.P2Q + exp_det
            tq = t_part * self.G2E
            got = np.asarray(eng._hpsi_sm(
                p, jnp.asarray(psi), jnp.full((3,), u),
                jnp.full((3,), tq)))
            H = hamiltonian(v * self.P2Q, exp_det, t_part,
                            detuning=self.DET, detuningDP=self.DETDP,
                            Om=self.OM, OmDP=self.OMDP, dr=self.DR,
                            gamToEinsteinFreq=self.G2E)
            np.testing.assert_allclose(got, H @ psi, atol=1e-12)

    def test_jump_tables_match_reference_chains(self):
        """levels.py's [S,2,S] destination table equals the reference's
        literal if-chain probabilities (SpeedUp.cpp:613-703) exactly."""
        from reference_qstep import collapse_chain, decay_matrix

        scheme = sr12_cooling(decay_ratio=self.DR)
        chains = collapse_chain(self.DR)
        for (src, br_name), chain in chains.items():
            br = 0 if br_name == "S" else 1
            tab = np.zeros(12)
            for dest, p in chain:
                tab[dest] += p
            np.testing.assert_allclose(scheme.jump_dest[src, br], tab,
                                       atol=1e-15,
                                       err_msg=f"src {src} branch {br_name}")
        # decay weights == decayMatrix diagonal
        np.testing.assert_allclose(scheme.decay_w,
                                   np.diag(decay_matrix(self.DR)),
                                   atol=1e-15)

    @pytest.mark.parametrize("renorm", [False, True])
    def test_sr12_qstep_trajectory_transcription(self, renorm):
        """Full trajectories (jumps, clock resets, Ehrenfest + recoil
        kicks, expansion detuning, beat notes) against the per-ion oracle
        with identical rolls, f64, 150 ticks."""
        from reference_qstep import qstep

        scheme, eng = self._engine(renormalize=renorm)
        n, T = 48, 150
        frac, te, dens, sig0 = 0.5, 19.0, 2.0, 4.0
        rng = np.random.default_rng(42)
        psi0 = rng.normal(size=(n, 12)) + 1j * rng.normal(size=(n, 12))
        psi0[:, 6:] *= 0.3        # some D population
        psi0 /= np.linalg.norm(psi0, axis=1, keepdims=True)
        v0 = rng.uniform(-0.8, 0.8, n)
        tp0 = rng.uniform(0.0, 2.0, n)
        rolls = rng.uniform(size=(T, 5, n))

        def exp_det_of(t):
            return (0.0126 * frac * te * t
                    / (np.sqrt(dens) * sig0
                       * np.sqrt(1 + 0.00014314 * t * t * te
                                 / (dens * sig0 * sig0))))

        # engine path (state-major, vectorized)
        psi_sm = jnp.asarray(psi0.T)
        vx = jnp.asarray(v0)
        tp = jnp.asarray(tp0)
        for k in range(T):
            psi_sm, vx, tp = eng.step_sm(
                psi_sm, vx, tp, exp_det=exp_det_of(k * self.QDT),
                rolls=jnp.asarray(rolls[k]))

        # oracle path (per-ion python loop)
        for i in range(n):
            w, v, tpart = psi0[i].copy(), v0[i], tp0[i]
            for k in range(T):
                w, v, tpart = qstep(
                    w, v, tpart, rolls[k, :, i], detuning=self.DET,
                    detuningDP=self.DETDP, Om=self.OM, OmDP=self.OMDP,
                    dr=self.DR, plasVelToQuantVel=self.P2Q,
                    gamToEinsteinFreq=self.G2E, dtQuant=self.QDT,
                    vKick=self.VKICK, vKickDP=self.VKICKDP,
                    fracOfSig=frac, Te=te, density=dens, sig0=sig0,
                    t=k * self.QDT, reNormalizewvFns=renorm,
                    dest_state_order=True)
            np.testing.assert_allclose(np.asarray(psi_sm[:, i]), w,
                                       atol=1e-10, err_msg=f"ion {i} psi")
            np.testing.assert_allclose(float(vx[i]), v, atol=1e-12,
                                       err_msg=f"ion {i} vx")
            np.testing.assert_allclose(float(tp[i]), tpart, atol=1e-12,
                                       err_msg=f"ion {i} t_part")


    def test_pre_speedup_convention_tables(self):
        """gs_convention='pre_speedup' differs from 'speedup' ONLY in the
        DP Ehrenfest-force weights, by the factor sqrt(dr)
        (LaserCoolingPlusExpansionMDQT.cpp:502 vs SpeedUp.cpp:503); the
        Hamiltonian, decay and jump tables are generation-invariant."""
        new = sr12_cooling(self.DET, self.DETDP, self.OM, self.OMDP,
                           decay_ratio=self.DR)
        old = sr12_cooling(self.DET, self.DETDP, self.OM, self.OMDP,
                           decay_ratio=self.DR,
                           gs_convention="pre_speedup")
        np.testing.assert_array_equal(old.coupling, new.coupling)
        np.testing.assert_array_equal(old.decay_w, new.decay_w)
        np.testing.assert_array_equal(old.jump_dest, new.jump_dest)
        np.testing.assert_array_equal(old.e0, new.e0)
        np.testing.assert_array_equal(old.e1, new.e1)
        assert old.tdep_coefs == new.tdep_coefs
        w_old = np.array(old.force_w)
        w_new = np.array(new.force_w)
        np.testing.assert_allclose(w_old[:4], w_new[:4], rtol=1e-15)  # SP
        np.testing.assert_allclose(w_old[4:], w_new[4:] * np.sqrt(self.DR),
                                   rtol=1e-14)                        # DP

    def test_pre_speedup_trajectory_transcription(self):
        """Engine with physics='pre_speedup' against the oracle in the
        old-generation kick convention, identical rolls, 60 ticks."""
        from reference_qstep import qstep

        scheme = with_recoil(
            sr12_cooling(self.DET, self.DETDP, self.OM, self.OMDP,
                         decay_ratio=self.DR, gs_convention="pre_speedup"),
            kick_s=self.VKICK, kick_d=self.VKICKDP)
        eng = QTEngine(scheme, h=self.QDT * self.G2E, dt_plasma=self.QDT,
                       plas_to_quant_vel=self.P2Q,
                       gamma_to_einstein=self.G2E, apply_force=True)
        n, T = 24, 60
        rng = np.random.default_rng(7)
        psi0 = rng.normal(size=(n, 12)) + 1j * rng.normal(size=(n, 12))
        psi0[:, 6:] *= 0.3
        psi0 /= np.linalg.norm(psi0, axis=1, keepdims=True)
        v0 = rng.uniform(-0.8, 0.8, n)
        tp0 = rng.uniform(0.0, 2.0, n)
        rolls = rng.uniform(size=(T, 5, n))

        psi_sm = jnp.asarray(psi0.T)
        vx = jnp.asarray(v0)
        tp = jnp.asarray(tp0)
        for k in range(T):
            psi_sm, vx, tp = eng.step_sm(psi_sm, vx, tp, exp_det=0.0,
                                         rolls=jnp.asarray(rolls[k]))

        for i in range(n):
            w, v, tpart = psi0[i].copy(), v0[i], tp0[i]
            for k in range(T):
                w, v, tpart = qstep(
                    w, v, tpart, rolls[k, :, i], detuning=self.DET,
                    detuningDP=self.DETDP, Om=self.OM, OmDP=self.OMDP,
                    dr=self.DR, plasVelToQuantVel=self.P2Q,
                    gamToEinsteinFreq=self.G2E, dtQuant=self.QDT,
                    vKick=self.VKICK, vKickDP=self.VKICKDP,
                    dest_state_order=True, gs_convention="pre_speedup")
            np.testing.assert_allclose(np.asarray(psi_sm[:, i]), w,
                                       atol=1e-10, err_msg=f"ion {i} psi")
            np.testing.assert_allclose(float(vx[i]), v, atol=1e-12,
                                       err_msg=f"ion {i} vx")


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


class TestSweepQTParams:
    """sweep_qt_params builds one QTParams from the unit scheme
    (detuning=om=1) and scales it with traced scalars; it must reproduce
    _params of the directly-constructed scheme for every tagging/toy
    variant (the Hamiltonians are linear in both knobs)."""

    def test_matches_direct_scheme(self):
        from mdqtplasmasims_tpu.core.qt import _params, sweep_qt_params
        from mdqtplasmasims_tpu.levels import tag408, tag422, three_state
        cases = [
            (tag422(1.0, 1.0), tag422(-3.5, 0.8)),
            (tag408(1.0, 1.0, linear=True), tag408(2.0, 1.7, linear=True)),
            (tag408(1.0, 1.0, linear=False), tag408(-0.5, 2.2,
                                                    linear=False)),
            (three_state(1.0, 1.0), three_state(-2.0, 0.3)),
        ]
        for unit, direct in cases:
            det, om = {"tag422_linear": (-3.5, 0.8),
                       "tag408_linear": (2.0, 1.7),
                       "tag408_quad": (-0.5, 2.2),
                       "three_state": (-2.0, 0.3)}[direct.name]
            got = sweep_qt_params(unit, jnp.asarray(det), jnp.asarray(om),
                                  jnp.float64, jnp.complex128)
            want = _params(direct, jnp.float64, jnp.complex128)
            for field in want._fields:
                np.testing.assert_allclose(
                    np.asarray(getattr(got, field)),
                    np.asarray(getattr(want, field)),
                    rtol=1e-14, atol=1e-15,
                    err_msg=f"{direct.name}.{field}")

    def test_step_sm_params_override_identity(self):
        """step_sm(params=unit-derived tables at the scheme's own values)
        is bit-identical to the scheme-derived default path."""
        from mdqtplasmasims_tpu.core.qt import sweep_qt_params
        scheme = tag422(-1.0, 1.3)
        unit = tag422(1.0, 1.0)
        eng = QTEngine(scheme, h=0.01, dt_plasma=0.01, apply_force=False)
        psi = random_s_superposition(jax.random.PRNGKey(1), 32, 5,
                                     jnp.complex128).T
        vx = jnp.linspace(-1, 1, 32)
        tp = jnp.zeros((32,))
        rolls = jax.random.uniform(jax.random.PRNGKey(5), (5, 32))
        a = eng.step_sm(psi, vx, tp, rolls=rolls)
        p = sweep_qt_params(unit, -1.0, 1.3, vx.dtype, psi.dtype)
        b = eng.step_sm(psi, vx, tp, rolls=rolls, params=p)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.array(x), np.array(y),
                                       rtol=1e-14, atol=1e-15)
