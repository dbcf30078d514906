"""Hardware (Mosaic) verification of the data-carried-1/ldeb force path
— the kappa-sweep kernel (VERDICT round-3 item 4: this production path
had only been validated in Pallas *interpret* mode, and interpret mode
does not enforce Mosaic restrictions — e.g. the 2-word prng_seed cap —
so hardware execution is the only real validation).

Two stages, both on the real TPU:

 1. kernel equality: `yukawa_forces_n3l_pallas` with a TRACED ldeb (the
    1/ldeb ridden in the position operand's spare column,
    ops/yukawa._half_pair_tile) == the same kernel with the compile-time
    static ldeb, on-device at f32 rounding; likewise the member-batched
    variant with per-member ldeb values (each member equal to its
    static-ldeb run).
 2. a real (Gamma, kappa) `transport-sweep` grid (2x2 = 4 points) run
    end-to-end as ONE vmapped program with per-point .dat trees —
    the workflow the reference serves by editing its :64-65 compile-time
    constants and rebuilding per point.

Usage: python tools/verify_kappa_hw.py [outdir]   (needs the TPU backend)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mdqtplasmasims_tpu.util import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kappa_hw"
    print("backend:", jax.default_backend())
    if jax.default_backend() == "cpu":
        raise RuntimeError("needs the TPU backend (got cpu)")

    from mdqtplasmasims_tpu.ops.yukawa import (
        yukawa_forces_n3l_pallas, yukawa_forces_n3l_pallas_batched)

    # --- stage 1: data-carried vs static ldeb, Mosaic-compiled ---------
    n, L = 1024, 16.22
    R = jax.random.uniform(jax.random.PRNGKey(0), (n, 3), jnp.float32,
                           0.0, L)
    ok = True
    for ldeb in (2.0, 1.0, 0.5):
        F_static = yukawa_forces_n3l_pallas(R, L, ldeb, tile=512)
        F_traced = jax.jit(
            lambda R, s: yukawa_forces_n3l_pallas(R, L, s, tile=512)
        )(R, jnp.float32(ldeb))
        d = float(jnp.abs(F_static - F_traced).max())
        m = float(jnp.abs(F_static).max())
        print(f"  single kernel  ldeb={ldeb}: max|dF| {d:.3e} "
              f"(max|F| {m:.3e})")
        ok &= d <= 1e-5 * m
    ldebs = jnp.asarray([2.0, 1.0, 0.5, 0.25], jnp.float32)
    Rb = jax.random.uniform(jax.random.PRNGKey(1), (4, 512, 3),
                            jnp.float32, 0.0, L)
    Fb = yukawa_forces_n3l_pallas_batched(Rb, L, ldebs, tile=512)
    for i, ld in enumerate(np.asarray(ldebs)):
        Fi = yukawa_forces_n3l_pallas_batched(Rb[i:i + 1], L, float(ld),
                                              tile=512)
        d = float(jnp.abs(Fb[i] - Fi[0]).max())
        m = float(jnp.abs(Fi).max())
        print(f"  batched member kappa={1/ld:.1f}: max|dF| {d:.3e}")
        ok &= d <= 1e-5 * m
    print("  stage 1 (Mosaic data-carried ldeb == static):",
          "PASS" if ok else "FAIL")

    # --- stage 2: a real (Gamma, kappa) sweep, one vmapped program -----
    from mdqtplasmasims_tpu.experiments.mc_md_anisotropy import (
        MCTransportConfig, run_sweep)
    cfg = MCTransportConfig(
        n=216, mc_steps=20_000, gr_every_mc=10_000,
        pre_record_md_steps=100, record_steps=500, gr_every_record=100,
        instant_aniso_steps=200, reequil_steps=100, aniso_time_us=2.0,
        aniso_relax_steps=200, save_directory=outdir)
    points = [dict(gamma=g, kappa=k) for g in (1.0, 3.0)
              for k in (0.5, 1.5)]
    t0 = time.perf_counter()
    results, member_cfgs = run_sweep(cfg, points)
    wall = time.perf_counter() - t0
    print(f"  sweep: {len(points)} (Gamma, kappa) points in {wall:.1f} s "
          f"(ONE vmapped program; reference: one rebuild+run per point)")
    ok2 = True
    for res, m in zip(results, member_cfgs):
        tm = float(np.asarray(res["temps"]).mean())
        vaf = np.asarray(res["vaf"])
        gr = np.asarray(res["gr_record"][-1])
        fin = all(np.isfinite(np.asarray(res[k])).all()
                  for k in ("temps", "vaf", "moments", "temps_inst"))
        # MC targets T = 1/Gamma (loosely — the reference's own comment
        # says it "won't" hit it exactly); 40% brackets both couplings
        t_ok = abs(tm - 1.0 / m.gamma) < 0.4 / m.gamma
        print(f"    Gamma={m.gamma} kappa={m.kappa}: T {tm:.3f} "
              f"(nominal {1/m.gamma:.3f}), vaf0 {vaf[0]:.3f}, "
              f"g(r) peak {gr.max():.2f}, finite={fin}")
        ok2 &= fin and t_ok and vaf[0] > 0
    # screening must actually bite: the two kappa members at Gamma=3
    # (point indices 2/3) must develop materially different pair
    # structure — measured on hardware the shorter-range kappa=1.5
    # potential packs a SHARPER first peak (1.49 vs 1.29) at a smaller
    # correlation hole; assert the separation, not a guessed direction
    g2 = np.asarray(results[2]["gr_record"][-1])
    g3 = np.asarray(results[3]["gr_record"][-1])
    pk2, pk3 = float(g2.max()), float(g3.max())
    hole2 = int(np.argmax(g2 > 0.5))
    hole3 = int(np.argmax(g3 > 0.5))
    print(f"  g(r) at Gamma=3: kappa=0.5 peak {pk2:.2f} hole {hole2} | "
          f"kappa=1.5 peak {pk3:.2f} hole {hole3}")
    ok2 &= abs(pk2 - pk3) > 0.1 and hole3 < hole2
    import glob
    ndirs = len(glob.glob(os.path.join(outdir, "*", "job*")))
    print(f"  per-point .dat dirs under {outdir}: {ndirs}")
    ok2 &= ndirs >= len(points)
    print("  stage 2 (end-to-end sweep):", "PASS" if ok2 else "FAIL")
    print("KAPPA HW VERIFY", "PASS" if ok and ok2 else "FAIL")
    return 0 if ok and ok2 else 1


if __name__ == "__main__":
    sys.exit(main())
