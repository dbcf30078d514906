"""In-process perf A/B on the real chip: QT fused-block tile, force-tile
sweeps across N, and ensemble aggregate throughput.  All variants compile
in one process and are timed as single big lax.scan dispatches closed by
a scalar fetch (the axon relay's post-fetch 26 ms dispatch latency is a
constant offset across variants).

Usage: python tools/perf_ab.py qt    [n_md_steps]
       python tools/perf_ab.py force [n_evals]
       python tools/perf_ab.py size  [n_md_steps]     # N=3500/14k/56k
       python tools/perf_ab.py ens   [n_segments]     # 8/16 jobs
"""

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from mdqtplasmasims_tpu.util import enable_compilation_cache
enable_compilation_cache()

from mdqtplasmasims_tpu.experiments.laser_cooling import (   # noqa: E402
    CoolingConfig, build_scheduler, canonical_run_cfg, initial_state)
from mdqtplasmasims_tpu.units import PlasmaUnits              # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "qt"
ARG = int(sys.argv[2]) if len(sys.argv) > 2 else 0


def time_md_loop(sched, state, n_steps):
    @jax.jit
    def loop(state):
        def body(s, _):
            return sched.md_step(s), None
        s, _ = jax.lax.scan(body, state, None, length=n_steps)
        return jnp.sum(s.V)

    float(loop(state))                     # compile + warm
    t0 = time.perf_counter()
    cs = float(loop(state))
    dt = time.perf_counter() - t0
    return dt / n_steps * 1e6, cs          # us per MD step


def _flagship(n0=3500):
    raw = CoolingConfig(n0=n0, tmax=30.0, sample_freq=40)
    return canonical_run_cfg(raw), initial_state(raw)


def mode_qt():
    n_steps = ARG or 500
    cfg, state = _flagship()
    sched = build_scheduler(cfg)
    print(f"ratio={sched.ratio} fused={sched.fused_spec is not None} "
          f"auto_tile={sched.tile}", flush=True)
    for tile in (512, 896, 1792, 3584):
        s = dataclasses.replace(sched, tile=tile)
        us, cs = time_md_loop(s, state, n_steps)
        print(f"qt_tile={tile:5d}: {us:8.1f} us/md_step "
              f"({us / sched.ratio:6.2f} us/tick)  cs={cs:.3e}", flush=True)


def mode_force():
    from mdqtplasmasims_tpu.ops.yukawa import yukawa_forces_n3l_pallas
    n_evals = ARG or 500
    pu = PlasmaUnits(2.0, 0.1)
    for n in (3500, 14000):
        L = PlasmaUnits.box_length(n)
        R0 = jax.random.uniform(jax.random.PRNGKey(0), (n, 3),
                                jnp.float32, 0, L)
        for tile in (512, 256, 128):
            @jax.jit
            def loop(R):
                def body(R, _):
                    F = yukawa_forces_n3l_pallas(R, L, pu.debye_length,
                                                 tile=tile)
                    return R + 1e-12 * F, None
                R, _ = jax.lax.scan(body, R, None, length=n_evals)
                return jnp.sum(R)

            float(loop(R0))
            t0 = time.perf_counter()
            float(loop(R0))
            us = (time.perf_counter() - t0) / n_evals * 1e6
            gpairs = (n * n / 2) / us * 1e-3
            print(f"N={n:6d} tile={tile:4d}: {us:8.1f} us/eval "
                  f"({gpairs:6.1f} Gpair/s half)", flush=True)


def mode_size():
    """Production-path (run_compiled SoA loop incl. sampling) throughput
    across N; n_segments scaled down at large N to bound wall time."""
    from mdqtplasmasims_tpu.experiments.laser_cooling import run_compiled
    for n0, n_seg in ((3500, 25), (14000, 10), (56000, 2)):
        cfg, state = _flagship(n0)

        def checksum():
            final, outs = run_compiled(cfg, state, n_seg)
            return float(jnp.sum(final.V) + jnp.sum(outs["ekin"]))

        checksum()
        t0 = time.perf_counter()
        checksum()
        dt = time.perf_counter() - t0
        ticks = n_seg * cfg.sample_freq * cfg.ratio
        ups = n0 * ticks / dt
        print(f"N={n0:6d}: {dt / ticks * 1e6:7.2f} us/tick "
              f"= {ups:.3e} updates/s", flush=True)


def mode_ens():
    from mdqtplasmasims_tpu.experiments.laser_cooling import (
        _initial_state_from_key, run_compiled_ensemble)
    n_seg = ARG or 5
    cfg, _ = _flagship()
    for n_jobs in (8, 16):
        keys = jax.random.split(jax.random.PRNGKey(0), n_jobs)
        states = jax.jit(jax.vmap(
            lambda k: _initial_state_from_key(cfg, k)))(keys)

        def ens_checksum():
            f, o = run_compiled_ensemble(cfg, states, n_seg)
            return float(jnp.sum(o["ekin"]))

        ens_checksum()
        t0 = time.perf_counter()
        ens_checksum()
        dt = time.perf_counter() - t0
        ticks = n_seg * cfg.sample_freq * cfg.ratio
        agg = n_jobs * cfg.n0 * ticks / dt
        print(f"jobs={n_jobs:3d}: {dt:7.2f} s for {ticks} ticks "
              f"= {agg:.3e} aggregate updates/s", flush=True)


def mode_soa():
    """Split the SoA-resident MD step: force-only vs QT-block-only."""
    from mdqtplasmasims_tpu.ops.yukawa import yukawa_forces_n3l_soa
    n_steps = ARG or 500
    cfg, state = _flagship()
    sched = build_scheduler(cfg)
    pu = PlasmaUnits(cfg.density, cfg.ge)
    L = PlasmaUnits.box_length(cfg.n0)
    npad = sched._npad(cfg.n0)
    mask_row = jnp.zeros((1, npad), jnp.float32).at[0, :cfg.n0].set(1.0)
    soa_forces = lambda Rp: yukawa_forces_n3l_soa(
        Rp, mask_row, L, pu.debye_length)

    @jax.jit
    def floop(state):
        carry = sched.soa_init(state, state.F)
        Rp = carry[0]

        def body(Rp, _):
            F = soa_forces(Rp)
            return Rp + 1e-12 * F, None
        Rp, _ = jax.lax.scan(body, Rp, None, length=n_steps)
        return jnp.sum(Rp)

    @jax.jit
    def qloop(state):
        carry = sched.soa_init(state, state.F)
        Fp = carry[2]

        def body(c, _):
            c = sched.soa_md_step(c, lambda Rp: Fp)   # QT block, no force
            return c, None
        c, _ = jax.lax.scan(body, carry, None, length=n_steps)
        return jnp.sum(c[1])

    @jax.jit
    def full(state):
        carry = sched.soa_init(state, state.F)

        def body(c, _):
            return sched.soa_md_step(c, soa_forces), None
        c, _ = jax.lax.scan(body, carry, None, length=n_steps)
        return jnp.sum(c[1])

    for name, fn in (("force_soa", floop), ("qt_block", qloop),
                     ("full_step", full)):
        float(fn(state))
        t0 = time.perf_counter()
        float(fn(state))
        us = (time.perf_counter() - t0) / n_steps * 1e6
        print(f"{name}: {us:8.1f} us/md_step ({us / sched.ratio:6.2f} "
              f"us/tick-equiv)", flush=True)


if __name__ == "__main__":
    dict(qt=mode_qt, force=mode_force, size=mode_size,
         ens=mode_ens, soa=mode_soa)[MODE]()
