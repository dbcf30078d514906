"""Hardware bench of the sharded (shard_map) fused production path.

VERDICT r2 item 1 'done' criterion: a 1-device-mesh shard_map bench
within ~10% of the single-chip BENCH rate.  Round-3 measurements (v5e,
1000-MD-step calls):

  E=1 on a 1-device mesh: 10.9 us/tick = 322M ion-QT-updates/s —
    identical to the single-chip non-shard_map bench (11.2).
  E=8 members folded: 77.6 us per 8-job tick = 361M aggregate
    ion-QT-updates/s — 16% above the single-run rate (the fold
    amortizes per-step fixed costs).  shard_map costs ~0.

Caveats: the first TWO calls of a fresh shard_map executable include a
~1.9 s warm-up on the axon backend (input relayout), and because this
script fetches a scalar between timed calls, every dispatch after the
first fetch pays the ~23 ms degraded-dispatch latency — n_steps must be
large enough to amortize it (at n_steps=100 the E=1 rate reads 2x slow
purely from that fixed cost; default is 1000).

Usage: python tools/bench_sharded.py [E] [n_steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mdqtplasmasims_tpu.util import enable_compilation_cache
enable_compilation_cache()

import jax


def main(E: int = 8, n_steps: int = 1000) -> None:
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
