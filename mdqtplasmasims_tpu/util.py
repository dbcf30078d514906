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
