"""Physics validation of the offline analysis layer (VERDICT round-4
weak #1 / item 1): Green-Kubo diffusion, static structure factor, and
the longitudinal/transverse dispersion were only synthetic-unit-tested —
this tool checks each against independent physics on real MD
trajectories, so `mdqt analyze` numbers can be trusted in normalization
and units.

Sections (all CPU f64, deterministic seeds; one in-tool Yukawa-OCP MD
driver feeds A-D):

A. ESTIMATOR IDENTITY - D from analysis.green_kubo_diffusion applied to
   the VAF (the reference's recordVAF observable,
   MonteCarloFollowedByMDAndTempAnisotropy.cpp:655-693, computed by
   ops.correlations.power_autocorr) must equal D from the Einstein
   mean-square displacement of the SAME trajectory (exact velocity-
   Verlet displacements, multi-origin FFT MSD, slope of MSD = 6 D t).
   Any factor error in the Green-Kubo normalization (the 1/3, the
   trapezoid, the lag units) breaks this equality.

B. LITERATURE ANCHOR - D at near-OCP screening (kappa = 0.1) against
   the Hansen-McDonald-Pollock one-component-plasma fit
   D = 2.95 Gamma^-1.34 (units a^2 omega_p; PRA 11, 1025 (1975); at the
   melting point this gives D* ~ 0.003, the widely quoted value, which
   pins the omega_p time-unit convention).  In this framework's
   Einstein-frequency units D_HMP = sqrt(3) * 2.95 * Gamma^-1.34
   a^2 omega_E.  Gates:
     * absolute level at the fit's reliable mid-range, Gamma_eff = 10
       and 20 (Gamma_eff = 1/T_realized — the Metropolis+thermostat
       equilibration lands slightly off the nominal 1/Gamma, the
       reference's own caveat): ratio in [0.7, 1.4].  Tight enough to
       catch a sqrt(3) = 1.73 unit slip either way.
     * the power-law exponent over Gamma in {5, 10, 20}: within
       [-1.7, -1.0] (HMP: -1.34; the local
       log-slope of D(Gamma) over one decade runs shallower than the
       global fit at the low end).
     * screening direction at fixed Gamma = 3: D(kappa = 0.5) >
       0.95 x D(kappa = 0.1) (screening weakens the coupling).
   At Gamma <= 3 the HMP fit is a known overestimate (outside its
   reliable range; measured ratio ~ 0.66 here) — reported, not gated;
   the soak point's absolute D is pinned by the MSD identity (A) and
   the cross-code pool (E) instead.

C. S(k) <-> g(r) CONSISTENCY - analysis.structure_factor_shells from
   trajectory snapshots vs the Fourier transform of the measured pair
   correlation, S_g(k) = 1 + 4 pi n int r^2 (g(r) - 1) sinc(kr) dr,
   integrated to the MIC cap r < L/2 (ops.structure.pair_correlation's
   own normalization quirks included in g).  Compared above
   k a >= 1.2 where the finite-volume truncation of the tail is small.

D. DISPERSION - J(k, t) rows written in the reference's J_interval0.dat
   schema (laserCoolingPlusExpansionMDQTSpeedUp.cpp:1040-1092 layout,
   laser_cooling.py writer) and analyzed by analysis.lccf_spectrum.
   The longitudinal peak at the smallest k shells must track the
   screened Bohm-Gross law

     omega_L(k)^2 = 3 k^2 / (k^2 + kappa^2) + 3 (T k)^2-term
                  = omega_pl^2 k^2/(k^2+kappa^2) + 3 T k^2   [omega_E^2]

   within [0.72, 1.25] (correlational QLCA corrections downshift a few
   percent at k ~ 1/a; the band also covers the finite d_omega bin).
   The transverse branch must report omega_T = 0 at Gamma = 3 (no
   propagating shear below the Gamma ~ 5 crossover) and a nonzero
   shear-wave branch at Gamma = 50 for k a ~ 1.

E. CROSS-CODE GREEN-KUBO - the SAME green_kubo_diffusion estimator run
   on the compiled reference binary's VAF.dat pool vs this framework's
   VAF.dat pool (the 16v16 cross_validate_transport_pooled workdir is
   reused when present; otherwise this section is skipped with a note).
   Pooled two-sample |z| < 2.

Writes artifacts/validate_analysis/report.json; exit 0 = every section
PASS.

Usage: python tools/validate_analysis.py [--fast] [--out DIR]
       (--fast shrinks the MD driver for smoke runs; the recorded
        validation uses the defaults)
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HMP_PREFACTOR = 2.95          # D* = 2.95 Gamma^-1.34, a^2 omega_p units
HMP_EXPONENT = -1.34


def hmp_d(gamma: float) -> float:
    """HMP OCP self-diffusion in this framework's a^2 omega_E units."""
    return math.sqrt(3.0) * HMP_PREFACTOR * gamma ** HMP_EXPONENT


def md_trajectory(n: int, gamma: float, kappa: float, *, mc_steps: int,
                  equil_steps: int, record_steps: int, seed: int,
                  dt: float = 0.005,
                  cache_dir: str = "/tmp/validate_analysis_cache"):
    """Equilibrated NVE Yukawa trajectory: lattice -> Metropolis ->
    collisional MD -> collisionless recording.  Returns host arrays
    vstore [T, N, 3], unwrapped displacements dr [T, N, 3] (exact
    velocity-Verlet drifts, for the Einstein MSD), wrapped positions
    R [T, N, 3], and the realized recording temperature."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from mdqtplasmasims_tpu.core.init import lattice_init
    from mdqtplasmasims_tpu.core.mc import MetropolisMC
    from mdqtplasmasims_tpu.core.md import wrap_pbc
    from mdqtplasmasims_tpu.core.thermostat import collide_and_kick
    from mdqtplasmasims_tpu.ops.yukawa import best_forces_fn

    cache = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        cache = os.path.join(
            cache_dir, f"traj_n{n}_g{gamma:g}_k{kappa:g}_mc{mc_steps}_"
                       f"eq{equil_steps}_r{record_steps}_s{seed}_"
                       f"dt{dt:g}.npz")
        if os.path.exists(cache):
            with np.load(cache) as z:
                return (z["vs"], z["dr"], z["rs"], float(z["L"]),
                        float(z["t"]))

    L = (n * 4.0 * np.pi / 3.0) ** (1.0 / 3.0)
    forces = best_forces_fn(n, L, 1.0 / kappa)

    @partial(jax.jit, static_argnames=("n_steps", "collision_freq",
                                       "record"))
    def md(R, V, A, key, n_steps, collision_freq=0.0, record=False):
        def step(carry, _):
            R, V, A, dr, key = carry
            key, kc = jax.random.split(key)
            drift = dt * V + 0.5 * dt * dt * A
            R = wrap_pbc(R + drift, L)
            A_new = forces(R)[0]
            V = V + 0.5 * dt * (A + A_new)
            if collision_freq:
                V = collide_and_kick(V, kc, dt=dt,
                                     collision_freq=collision_freq,
                                     gamma=gamma)
            out = (V, drift, R) if record else None
            return (R, V, A_new, dr + drift, key), out

        dr0 = jnp.zeros_like(R)
        (R, V, A, _, key), outs = jax.lax.scan(
            step, (R, V, A, dr0, key), None, length=n_steps)
        return (R, V, A, key), outs

    key = jax.random.PRNGKey(seed)
    k_lat, k_mc, k_run = jax.random.split(key, 3)
    R, V = lattice_init(k_lat, n, gamma, L, dtype=jnp.float64)
    mc = MetropolisMC(L=L, ldeb=1.0 / kappa, gamma=gamma)
    R, _ = jax.jit(mc.run, static_argnums=2)(R, k_mc, mc_steps)
    A = forces(R)[0]
    (R, V, A, key), _ = md(R, V, A, key, equil_steps,
                           collision_freq=0.25)
    (_, _, _, _), (vs, drifts, rs) = md(R, V, A, key, record_steps,
                                        record=True)
    vs = np.asarray(vs)
    dr = np.cumsum(np.asarray(drifts), axis=0)   # exact VV displacement
    rs = np.asarray(rs)
    t_rec = float((vs ** 2).mean())              # <v_axis^2> = T
    if cache:
        tmp = cache + ".tmp.npz"
        np.savez(tmp, vs=vs, dr=dr, rs=rs, L=L, t=t_rec)
        os.replace(tmp, cache)
    return vs, dr, rs, L, t_rec


def fft_msd(dr: np.ndarray, dt: float):
    """Multi-origin Einstein MSD via the standard S1 - 2 S2 FFT
    algorithm, summed over the 3 axes.  dr is [T, N, 3] unwrapped
    displacement from t=0; returns (lags, msd[T])."""
    T = dr.shape[0]
    x = dr.reshape(T, -1)                       # [T, N*3]
    # S2(tau) = sum_t x(t) x(t+tau), via rFFT (zero-padded to 2T)
    f = np.fft.rfft(x, n=2 * T, axis=0)
    s2 = np.fft.irfft(f * f.conj(), n=2 * T, axis=0)[:T].real
    sq = (x ** 2)
    css = np.concatenate([np.zeros((1, x.shape[1])),
                          np.cumsum(sq, axis=0)])
    # S1(tau) = sum_{t=0}^{T-1-tau} x(t)^2 + sum_{t=tau}^{T-1} x(t)^2
    tau = np.arange(T)
    head = css[T - tau] - css[0]                # sum_{t<T-tau} x^2
    tail = css[T] - css[tau]                    # sum_{t>=tau} x^2
    s1 = head + tail
    counts = (T - tau)[:, None]
    msd = (s1 - 2.0 * s2) / counts              # per series
    msd = msd.reshape(T, dr.shape[1], 3).sum(axis=2).mean(axis=1)
    return tau * dt, msd


def sinc_transform_of_g(g_quirk: np.ndarray, k: np.ndarray, *,
                        dr: float = 0.05,
                        density: float = 3.0 / (4.0 * np.pi)):
    """S_g(k) = 1 + 4 pi n int r^2 (g-1) sin(kr)/(kr) dr from the
    EMITTED g(r) histogram, undoing the reference's integer-shell
    normalization first: bin i >= 1 divides its count by 3 i^2 dr^3
    instead of the exact shell volume ((i+1)^3 - i^3) dr^3
    (MonteCarlo...cpp:626-635; ops.structure.pair_correlation reproduces
    the quirk bit-for-bit), a (1 + 1/i)^2-level multiplicative bias that
    matters at this check's accuracy.  Each bin contributes its exact
    shell integral with the sinc kernel evaluated at the bin's
    volume-centroid radius."""
    i = np.arange(1, g_quirk.shape[0])           # bin 0 is exact & g~0
    shell = ((i + 1) ** 3 - i ** 3) * dr ** 3    # exact /(4 pi / 3)
    g_true = g_quirk[1:] * (3.0 * i ** 2) / ((i + 1) ** 3 - i ** 3)
    r_c = 0.75 * ((i + 1) ** 4 - i ** 4) / ((i + 1) ** 3 - i ** 3) * dr
    h = g_true - 1.0
    out = np.empty_like(k)
    vol = (4.0 * np.pi / 3.0) * shell            # exact shell volumes
    for j, kk in enumerate(k):
        kern = np.sin(kk * r_c) / (kk * r_c)
        out[j] = 1.0 + density * np.sum(vol * h * kern)
    return out


def section_ad(args, report):
    """Sections A-D share one trajectory at the soak point
    (Gamma=3, kappa=0.5) plus a near-OCP run (B) and a strongly coupled
    run (D transverse)."""
    import jax.numpy as jnp
    from mdqtplasmasims_tpu.analysis import (green_kubo_diffusion,
                                             lccf_spectrum,
                                             structure_factor_shells)
    from mdqtplasmasims_tpu.ops.correlations import power_autocorr
    from mdqtplasmasims_tpu.ops.structure import (current_fourier, k_grid,
                                                  pair_correlation)

    n = 512 if not args.fast else 216
    rec = args.record_steps if not args.fast else 1200
    dt = 0.005
    gamma, kappa = 3.0, 0.5
    t0 = time.perf_counter()
    vs, dr, rs, L, t_rec = md_trajectory(
        n, gamma, kappa, mc_steps=30_000 if not args.fast else 6_000,
        equil_steps=400, record_steps=rec, seed=11, dt=dt)
    print(f"[driver] N={n} Gamma={gamma} kappa={kappa}: {rec} recording "
          f"steps, T_rec={t_rec:.4f} (nominal {1/gamma:.4f}), "
          f"{time.perf_counter()-t0:.0f}s")

    # ---- A: Green-Kubo vs Einstein MSD on the same trajectory
    vaf = np.asarray(power_autocorr(jnp.asarray(vs), 1, gamma))
    lags = np.arange(rec) * dt
    # integrate only to the converged window (VAF decayed; the tail of
    # the FFT estimator is noise-dominated) — use the first half
    w = rec // 2
    gk = green_kubo_diffusion(np.stack([lags[:w], vaf[:w]], -1),
                              plateau_frac=0.3)
    t_m, msd = fft_msd(dr, dt)
    # ballistic -> diffusive crossover: fit the slope over the same
    # trailing window the GK plateau uses
    i0, i1 = int(0.5 * w), w
    slope = np.polyfit(t_m[i0:i1], msd[i0:i1], 1)[0]
    d_msd = slope / 6.0
    ratio = gk["d"] / d_msd
    ok_a = abs(ratio - 1.0) < 0.15
    print(f"[A] D_GK = {gk['d']:.4f} (drift {gk['drift']*100:.1f}%)  "
          f"D_MSD = {d_msd:.4f}  ratio = {ratio:.3f}  "
          f"{'PASS' if ok_a else 'FAIL'} (band |ratio-1| < 0.15)")
    report["A_gk_vs_msd"] = dict(d_gk=gk["d"], d_msd=d_msd, ratio=ratio,
                                 gk_drift=gk["drift"], t_rec=t_rec,
                                 n=n, record_steps=rec, ok=bool(ok_a))

    # ---- C: S(k) from positions vs Fourier transform of g(r).
    # Individual shells average only a handful of k-vectors over ~15
    # structurally independent configurations (the 40 omega_E^-1
    # window), so per-shell S_pos carries ~0.05-0.1 statistical scatter
    # while the g(r) transform (every pair pooled) is smooth; a
    # normalization/units error is SYSTEMATIC, so the gate compares
    # k-binned means, where the scatter averages down.
    snaps = rs[:: max(1, rec // 400)]
    s_shells = None
    for R in snaps:
        s = structure_factor_shells(R, L)
        s_shells = (s["s"] if s_shells is None else s_shells + s["s"])
    s_shells /= len(snaps)
    kk = s["k"]
    g_acc = None
    for R in snaps:
        g1 = np.asarray(pair_correlation(jnp.asarray(R), L))
        g_acc = g1 if g_acc is None else g_acc + g1
    g_acc /= len(snaps)
    n_gr = int((L / 2.0) / 0.05)
    s_from_g = sinc_transform_of_g(g_acc[:n_gr], kk)
    # below k ~ 1.2/a the r < L/2 truncation of the (g-1) tail bites;
    # above k ~ 6/a the dr = 0.05 histogram undersamples the sinc
    edges = np.arange(1.2, 6.01, 0.4)
    bins = []
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = (kk >= lo) & (kk < hi)
        if m.sum() >= 2:
            bins.append(dict(k_lo=float(lo), k_hi=float(hi),
                             n=int(m.sum()),
                             ds_mean=float((s_shells[m]
                                            - s_from_g[m]).mean()),
                             s_pos=float(s_shells[m].mean()),
                             s_g=float(s_from_g[m].mean())))
    err = max(abs(b["ds_mean"]) for b in bins)
    rms = float(np.sqrt(np.mean([(b["ds_mean"]) ** 2 for b in bins])))
    ok_c = err < 0.05
    print(f"[C] S(k) vs FT[g(r)], {len(bins)} k-bins over "
          f"[1.2, 6.0]/a: max |binned dS| = {err:.4f} (rms {rms:.4f})  "
          f"{'PASS' if ok_c else 'FAIL'} (band < 0.05)")
    report["C_sk_gofr"] = dict(max_abs_err=float(err), rms=rms,
                               bins=bins, ok=bool(ok_c))

    # ---- D: dispersion through the real J_interval0.dat pipeline
    job = os.path.join("/tmp/validate_analysis_cache",
                       "dispersion_job")
    shutil.rmtree(job, ignore_errors=True)
    os.makedirs(job)
    j_every = 4
    kv = k_grid(L, 12)
    ks = np.stack(np.meshgrid(np.arange(12), np.arange(12),
                              np.arange(12), indexing="ij"),
                  -1).reshape(-1, 3)
    rows = []
    for j in range(0, rec, j_every):
        J = np.asarray(current_fourier(jnp.asarray(rs[j]),
                                       jnp.asarray(vs[j]),
                                       jnp.asarray(kv)))
        rows.append(np.concatenate([
            np.full((kv.shape[0], 1), j), ks,
            np.stack([J[0].real, J[0].imag, J[1].real, J[1].imag,
                      J[2].real, J[2].imag], -1)], axis=1))
    np.savetxt(os.path.join(job, "J_interval0.dat"),
               np.concatenate(rows), fmt="%.8g", delimiter="\t")
    spec = lccf_spectrum(job, timestep=dt, max_shell=9)
    d_om = float(spec["omega"][1] - spec["omega"][0])
    ok_d = True
    d_rows = []
    print("[D] longitudinal dispersion vs screened Bohm-Gross "
          "(lowest 4 shells):")
    for q, kn, pk, pt in list(zip(spec["k_int2"], spec["k"],
                                  spec["omega_peak"],
                                  spec["omega_peak_t"]))[:4]:
        k_phys = 2.0 * np.pi * kn / L
        th = math.sqrt(3.0 * k_phys ** 2 / (k_phys ** 2 + kappa ** 2)
                       + 3.0 * t_rec * k_phys ** 2)
        ratio = pk / th
        in_band = 0.72 < ratio < 1.25
        ok_d &= in_band
        # transverse at Gamma = 3: no shear peak above the noise floor
        # (an overdamped spectrum's argmax can land a bin or two up on
        # finite statistics — 'propagating' means well-resolved, i.e.
        # clear of the first few frequency bins)
        ok_d &= pt <= 2.5 * d_om
        d_rows.append(dict(n2=int(q), k=float(k_phys),
                           omega_peak=float(pk), omega_theory=float(th),
                           ratio=float(ratio), omega_t=float(pt)))
        print(f"    |n|^2={q:2d}  k={k_phys:.3f}  omega={pk:.3f}  "
              f"theory={th:.3f}  ratio={ratio:.3f}  omega_T={pt:.3f}")
    # strongly coupled transverse branch: shear waves at Gamma = 50
    # (longer anneal — a half-melted lattice at Gamma = 50 needs it —
    # and a 2x window: the shear mode sits at omega ~ 0.3 omega_E, so
    # the frequency bin must be fine enough to resolve it above the
    # overdamped-noise floor)
    rec50 = 2 * rec
    vs50, _, rs50, L50, t50 = md_trajectory(
        n, 50.0, kappa, mc_steps=60_000 if not args.fast else 6_000,
        equil_steps=800, record_steps=rec50, seed=13, dt=dt)
    print(f"    Gamma=50 run: realized T = {t50:.5f} "
          f"(Gamma_eff {1.0 / t50:.1f})")
    job50 = os.path.join("/tmp/validate_analysis_cache",
                         "dispersion_job_g50")
    shutil.rmtree(job50, ignore_errors=True)
    os.makedirs(job50)
    rows = []
    for j in range(0, rec50, j_every):
        J = np.asarray(current_fourier(jnp.asarray(rs50[j]),
                                       jnp.asarray(vs50[j]),
                                       jnp.asarray(kv)))
        rows.append(np.concatenate([
            np.full((kv.shape[0], 1), j), ks,
            np.stack([J[0].real, J[0].imag, J[1].real, J[1].imag,
                      J[2].real, J[2].imag], -1)], axis=1))
    np.savetxt(os.path.join(job50, "J_interval0.dat"),
               np.concatenate(rows), fmt="%.8g", delimiter="\t")
    spec50 = lccf_spectrum(job50, timestep=dt, max_shell=16)
    d_om50 = float(spec50["omega"][1] - spec50["omega"][0])
    k50 = 2.0 * np.pi * spec50["k"] / L50
    shear = spec50["omega_peak_t"][(k50 > 0.6) & (k50 < 2.5)]
    has_shear = bool((shear > 2.5 * d_om50).any())
    ok_d &= has_shear
    print(f"    Gamma=50 transverse branch at k~1/a: "
          f"omega_T={[round(float(x),3) for x in shear[:6]]} -> "
          f"propagating shear {'PASS' if has_shear else 'FAIL'}")
    print(f"[D] dispersion {'PASS' if ok_d else 'FAIL'} "
          f"(L band [0.72, 1.25]; omega_T = 0 at Gamma=3, > 0 at "
          f"Gamma=50)")
    report["D_dispersion"] = dict(rows=d_rows, gamma50_shear=has_shear,
                                  gamma50_omega_t=[float(x)
                                                   for x in shear],
                                  ok=bool(ok_d))

    # ---- B: literature anchor at near-OCP screening (kappa = 0.1)
    mc = 30_000 if not args.fast else 6_000
    pts = []
    for g_run, seed in ((3.0, 12), (5.0, 14), (10.0, 15), (20.0, 16)):
        vs1, _, _, _, t1 = md_trajectory(
            n, g_run, 0.1, mc_steps=mc, equil_steps=400,
            record_steps=rec, seed=seed, dt=dt)
        vaf1 = np.asarray(power_autocorr(jnp.asarray(vs1), 1, g_run))
        gk1 = green_kubo_diffusion(
            np.stack([lags[:w], vaf1[:w]], -1), plateau_frac=0.3)
        g_eff = 1.0 / t1
        pts.append(dict(gamma=g_run, gamma_eff=float(g_eff),
                        d=float(gk1["d"]), d_hmp=hmp_d(g_eff),
                        ratio=float(gk1["d"] / hmp_d(g_eff)),
                        drift=float(gk1["drift"])))
        print(f"[B] Gamma={g_run:4.1f} (eff {g_eff:5.2f})  "
              f"D = {gk1['d']:.4f}  HMP = {hmp_d(g_eff):.4f}  "
              f"ratio = {pts[-1]['ratio']:.3f}  "
              f"(drift {gk1['drift']*100:.0f}%)")
    # gate 1: absolute level at the fit's reliable mid-range
    mid = [p for p in pts if p["gamma"] >= 10.0]
    ok_b = all(0.7 < p["ratio"] < 1.4 for p in mid)
    # gate 2: measured exponent over Gamma_eff in {5,10,20}
    fitpts = [p for p in pts if p["gamma"] >= 5.0]
    lg = np.log([p["gamma_eff"] for p in fitpts])
    ld = np.log([p["d"] for p in fitpts])
    expo = float(np.polyfit(lg, ld, 1)[0])
    ok_b &= -1.7 < expo < -1.0
    # gate 3: screening direction at fixed Gamma = 3
    d_ocp3 = pts[0]["d"]
    screening = gk["d"] / d_ocp3
    ok_b &= screening > 0.95
    print(f"[B] exponent (Gamma_eff >= 5) = {expo:.3f} (HMP -1.34); "
          f"D(kappa=0.5)/D(kappa=0.1) at Gamma=3 = {screening:.3f}; "
          f"mid-range ratios "
          f"{[round(p['ratio'], 2) for p in mid]}  "
          f"{'PASS' if ok_b else 'FAIL'}")
    report["B_hmp_anchor"] = dict(
        points=pts, exponent=expo, screening_ratio=float(screening),
        d_kappa05=gk["d"], ok=bool(ok_b))
    return ok_a and ok_b and ok_c and ok_d


def section_e(args, report):
    """Cross-code Green-Kubo: the same estimator on the compiled
    reference's VAF.dat pool vs the framework's."""
    from mdqtplasmasims_tpu.analysis import (green_kubo_diffusion,
                                             two_sample_z)
    ref_glob = os.path.join(args.xval_workdir, "refdata", "*", "job*",
                            "VAF.dat")
    ref_files = sorted(glob.glob(ref_glob))
    if not ref_files:
        print(f"[E] SKIPPED - no reference VAF pool at {ref_glob}; run "
              "tools/cross_validate_transport_pooled.py first")
        report["E_cross_code"] = dict(skipped=True)
        return True
    from mdqtplasmasims_tpu.experiments.mc_md_anisotropy import (
        MCTransportConfig, run_ensemble)
    k = min(len(ref_files), 16)
    ref_files = ref_files[:k]
    d_ref = []
    for f in ref_files:
        rows = np.loadtxt(f)
        w = rows.shape[0] // 2
        d_ref.append(green_kubo_diffusion(rows[:w], plateau_frac=0.3)["d"])
    cfg = MCTransportConfig(
        n=512, kappa=0.5, gamma=3.0, density=0.4, mc_steps=30_000,
        gr_every_mc=10_000, pre_record_md_steps=200, record_steps=600,
        gr_every_record=100, instant_aniso_steps=8,
        reequil_steps=8, aniso_time_us=0.1, aniso_relax_steps=8,
        dtype="float64")
    res = run_ensemble(cfg, k, seed=21)
    lags = np.arange(cfg.record_steps) * cfg.timestep
    d_fw = []
    for r in res:
        w = cfg.record_steps // 2
        d_fw.append(green_kubo_diffusion(
            np.stack([lags[:w], np.asarray(r["vaf"])[:w]], -1),
            plateau_frac=0.3)["d"])
    z = two_sample_z(d_ref, d_fw)
    ok = abs(z) < 2.0
    print(f"[E] D_GK pooled ({k}v{k}): ref {np.mean(d_ref):.4f} +- "
          f"{np.std(d_ref, ddof=1):.4f} vs fw {np.mean(d_fw):.4f} +- "
          f"{np.std(d_fw, ddof=1):.4f}  z = {z:+.2f}  "
          f"{'PASS' if ok else 'FAIL'} (|z| < 2; same estimator both "
          f"sides)")
    report["E_cross_code"] = dict(
        k=k, d_ref_mean=float(np.mean(d_ref)),
        d_ref_sd=float(np.std(d_ref, ddof=1)),
        d_fw_mean=float(np.mean(d_fw)),
        d_fw_sd=float(np.std(d_fw, ddof=1)), z=float(z), ok=bool(ok))
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="shrunken smoke run (not the recorded bands)")
    ap.add_argument("--record-steps", type=int, default=8000)
    ap.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "validate_analysis"))
    ap.add_argument("--xval-workdir", default="/tmp/xval_transport_pooled")
    ap.add_argument("--skip-e", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from mdqtplasmasims_tpu.util import enable_compilation_cache
    enable_compilation_cache()

    os.makedirs(args.out, exist_ok=True)
    report = dict(fast=args.fast, record_steps=args.record_steps)
    t0 = time.perf_counter()
    ok = section_ad(args, report)
    if not args.skip_e:
        ok &= section_e(args, report)
    report["wall_s"] = time.perf_counter() - t0
    report["ok"] = bool(ok)
    path = os.path.join(args.out, "report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {path}  ({report['wall_s']:.0f}s)")
    print("ANALYSIS VALIDATION", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
