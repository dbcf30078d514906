"""Hardware bench of the sharded (shard_map) fused production path.

VERDICT r2 item 1 'done' criterion: a 1-device-mesh shard_map bench
within ~10% of the single-chip BENCH rate.  Round-3 measurements (v5e):

  E=8 members folded on a 1-device mesh: 88.2 us per 8-job tick
    = 318M aggregate ion-QT-updates/s
    vs 312-333M for the non-shard_map paths (single-run bench.py /
    ensemble8 fold) — shard_map costs ~0 at steady state.
  E=1 on the same mesh: ~21 us/tick, matching the non-shard_map E=1
    fold (22.4): the 2x gap vs the single-run 11.2 us/tick is the
    batched kernels' fixed per-MD-step cost, amortized away at E>=8 —
    production ensembles run at full rate.

Caveat: the first TWO calls of a fresh shard_map executable include a
~1.9 s warm-up on the axon backend (input relayout); bench after a
warm-up rep, or the rate reads ~40x low.

Usage: python tools/bench_sharded.py [E] [n_steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main(E: int = 8, n_steps: int = 100) -> None:
    E, n_steps = int(E), int(n_steps)
    from mdqtplasmasims_tpu.experiments.laser_cooling import (
        CoolingConfig, build_scheduler, _initial_state_from_key)
    from mdqtplasmasims_tpu.parallel.ensemble import (
        make_sharded_fused_step, shard_keys)
    from mdqtplasmasims_tpu.parallel.mesh import make_mesh
    from mdqtplasmasims_tpu.units import PlasmaUnits

    cfg = CoolingConfig(n0=3500)
    pu = PlasmaUnits(cfg.density, cfg.ge)
    sched = build_scheduler(cfg)
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    keys = shard_keys(jax.random.PRNGKey(0), E, 1)
    states = jax.jit(jax.vmap(
        lambda k: _initial_state_from_key(cfg, k)))(keys[:, 0])
    states = states._replace(key=keys)
    step = make_sharded_fused_step(sched, pu.debye_length, mesh,
                                   n_steps=n_steps)
    out = step(states)
    _ = float(out.R[0, 0, 0])
    out = step(out)
    _ = float(out.R[0, 0, 0])          # warm-up rep (see caveat)
    t0 = time.perf_counter()
    out = step(out)
    _ = float(out.R[0, 0, 0])
    dt = time.perf_counter() - t0
    ticks = n_steps * cfg.ratio
    print(f"sharded E={E} on 1-dev mesh: {dt / ticks * 1e6:.1f} us per "
          f"{E}-job tick, {E * cfg.n0 * ticks / dt / 1e6:.0f}M "
          f"ion-qt-updates/s aggregate")


if __name__ == "__main__":
    main(*sys.argv[1:])
