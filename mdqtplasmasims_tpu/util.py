"""Small runtime utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _split_ri(x):
    return x.real, x.imag


@jax.jit
def _fresh_copy(x):
    """Materialize into a fresh default-layout buffer (some backends refuse
    to transfer buffers with exotic layouts, e.g. scan-stacked outputs)."""
    return x + jnp.zeros((), x.dtype)


def _get_real(x):
    try:
        return jax.device_get(x)
    except Exception:
        return jax.device_get(_fresh_copy(x))


@jax.jit
def _combine_ri(r, i):
    return r + 1j * i.astype(r.dtype)


def safe_device_put(x):
    """Host -> device hardened for quirky PJRT backends: complex host
    arrays are shipped as two real transfers and combined on device
    (complex transfers are UNIMPLEMENTED on the axon-tunneled TPU; the
    error surfaces asynchronously at the next block/fetch, far from the
    offending ``device_put``)."""
    x = np.asarray(x)
    if np.issubdtype(x.dtype, np.complexfloating):
        r = np.ascontiguousarray(x.real)
        i = np.ascontiguousarray(x.imag)
        return _combine_ri(jnp.asarray(r), jnp.asarray(i))
    return jnp.asarray(x)


def safe_device_get(tree):
    """``jax.device_get`` hardened for quirky PJRT backends (the
    axon-tunneled TPU in this container): complex leaves are transferred as
    a jitted real/imag split (complex transfers are UNIMPLEMENTED there),
    and failed transfers are retried through a fresh device-side copy."""
    leaves, treedef = jax.tree.flatten(tree)
    out = []
    for x in leaves:
        if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype,
                                                       jnp.complexfloating):
            r, i = _split_ri(x)
            out.append(np.asarray(_get_real(r)) + 1j * np.asarray(_get_real(i)))
        elif isinstance(x, jax.Array):
            out.append(_get_real(x))
        else:
            out.append(jax.device_get(x))
    return jax.tree.unflatten(treedef, out)


def enable_compilation_cache() -> str | None:
    """Wire JAX's persistent compilation cache (opt-out via
    ``MDQT_NO_COMPILE_CACHE=1``; directory override via
    ``MDQT_COMPILE_CACHE_DIR``).

    On the axon-tunneled TPU fresh remote compiles dominate real runs
    (RESULTS.md: a 7 s-device-compute soak spent ~1000 s in compile/
    fetch stalls), so every entry point (cli, bench, tools) calls this
    before tracing.  Returns the cache dir, or None when disabled."""
    import os
    if os.environ.get("MDQT_NO_COMPILE_CACHE"):
        return None
    path = os.environ.get("MDQT_COMPILE_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "mdqtplasmasims_tpu",
        "jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took noticeable compile time; the
        # default (1 s floor + 0.9 explain-cache-miss ratio) already
        # fits, but pin the floor so tiny-but-remote compiles cache too
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.2)
    except Exception:           # cache is an optimization, never fatal
        return None
    return path
