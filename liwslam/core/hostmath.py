"""Placement of setup-time math: local CPU eager, numpy out.

Over the tunneled TPU every EAGER jnp op is its own remote program — a
remote compile (seconds, cached per op shape) plus a round trip — and
device-resident closure constants are fetched back ONE BY ONE when a jit
program is lowered (``mlir.ir_constant`` -> ``array._value``, ~2 s per
constant over the tunnel; measured 32 s of a 36 s lowering).  Setup-time
constructors (solve consts, dyn-config packs, initial track state)
therefore run their math on the LOCAL CPU backend and return host
numpy: numpy leaves embed into lowered modules with zero tunnel traffic
and transfer to the accelerator once at jit dispatch.
"""

from __future__ import annotations

import functools

import jax
import numpy as np


def _local_cpu():
    try:
        # local_devices, not devices: under jax.distributed the global
        # device list starts with process 0's devices, which other
        # processes cannot address (their jit outputs can't be fetched)
        return jax.local_devices(backend="cpu")[0]
    except Exception:  # cpu backend not exposed on this platform set
        return None


def _fetch(x):
    return jax.device_get(x) if isinstance(x, jax.Array) else x


def setup_fn(f):
    """Run ``f``'s eager math on the local CPU and return host numpy.

    Transparent to traced use: if any input leaf is a tracer (the
    constructor was called inside jit/vmap), ``f`` runs unchanged on the
    trace.  Concrete device-array inputs are fetched to host first (one
    transfer each), so e.g. window slices living on the TPU are legal
    arguments.
    """

    @functools.wraps(f)
    def wrapped(*args, **kw):
        flat, treedef = jax.tree_util.tree_flatten((args, kw))
        if any(isinstance(l, jax.core.Tracer) for l in flat):
            return f(*args, **kw)
        cpu = _local_cpu()
        if cpu is None:
            return f(*args, **kw)
        # One jit program per call structure, not per value: array leaves
        # become jit arguments (value-independent HLO -> the persistent
        # compilation cache hits across processes and input values);
        # everything else (params objects, ints, dtypes) stays closure.
        # Under axon even the CPU backend compiles REMOTELY, so eager
        # per-op dispatch here costs seconds per op — one program total
        # keeps setup off the tunnel's per-op path.
        is_arr = [isinstance(l, (jax.Array, np.ndarray)) for l in flat]
        dyn = [_fetch(l) for l, a in zip(flat, is_arr) if a]

        def call(dyn_vals):
            it = iter(dyn_vals)
            full = [next(it) if a else l for l, a in zip(flat, is_arr)]
            a2, k2 = jax.tree_util.tree_unflatten(treedef, full)
            return f(*a2, **k2)

        with jax.default_device(cpu):
            out = jax.jit(call)(dyn)
        return jax.tree_util.tree_map(_fetch, out)

    return wrapped
