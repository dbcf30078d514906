"""Self-retrying TPU probe: fetch-vs-duration experiment + bench numbers.
Appends results to /tmp/tpu_probe_results.log. Run under a generous timeout.
"""
import sys
import time

import jax
import jax.numpy as jnp

LOG = "/tmp/tpu_probe_results.log"


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def main():
    from mdqtplasmasims_tpu.experiments.laser_cooling import (
        CoolingConfig, initial_state, run_compiled)
    cfg = CoolingConfig(n0=3500)
    state = initial_state(cfg)
    log("init ok")
    for nseg in (1, 2, 4, 25):
        t0 = time.perf_counter()
        final, outs = run_compiled(cfg, state, nseg)
        try:
            v = float(jnp.sum(outs["ekin"]))
            log(f"nseg={nseg}: fetch OK {v:.5f} ({time.perf_counter()-t0:.1f}s)")
        except Exception as e:
            log(f"nseg={nseg}: fetch ERR {str(e)[:60]} ({time.perf_counter()-t0:.1f}s)")
    # timing with per-dispatch fetch (nseg=4 chunks)
    t0 = time.perf_counter()
    total_seg = 0
    st = state
    while total_seg < 24:
        st, outs = run_compiled(cfg, st, 4)
        _ = float(jnp.sum(outs["ekin"]))
        total_seg += 4
    dt = time.perf_counter() - t0
    ticks = 24 * 40 * cfg.ratio
    log(f"chunked 24 seg w/ fetches: {dt:.2f}s -> {dt/ticks*1e6:.1f} us/tick "
        f"-> est full run {dt/24*375/60:.2f} min")


if __name__ == "__main__":
    main()
