"""Device-honest wall-clock timing through the axon TPU relay.

Through the relay, ``jax.block_until_ready`` returns as soon as the
execute RPC is *enqueued* (~0.1 ms), not when the program finishes on
the chip — timing loops closed by ``block_until_ready`` measure host
dispatch, which is how a 115 ms pipeline step can "measure" 0.4 ms.
The only way to observe completion is an actual device->host value
fetch, which rides the same FIFO program stream and therefore lands
only after every previously enqueued program has executed (FIFO
verified empirically: 10 independent programs + 1 fetch of the last
output cost 10x one program + fetch).

Recipe used by every timing tool in this repo:

    ms, out = timeit(fn, *args, n=10)

which (1) warms compile + the sync reducer, (2) calibrates the fetch
round-trip (~25 ms, constant) on an already-materialised buffer,
(3) dispatches ``n`` calls and closes with ONE scalar fetch, and
(4) reports ``(elapsed - fetch_overhead) / n``.

Works identically on CPU/GPU backends (where the fetch overhead is
just ~0) so the same tools run against the virtual-device mesh.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sync", "fetch_overhead", "timeit", "timeit_chain"]

# one jitted scalar reducer per (shape, dtype) — the reducer itself is a
# program, so it must be compiled (and its compile excluded) before any
# timed region
_SYNC_CACHE: dict = {}


def _first_array_leaf(out: Any):
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype") and hasattr(leaf, "shape"):
            return leaf
    raise ValueError("no array leaf in output to sync on")


def sync(out: Any) -> float:
    """Block until ``out``'s program (and all enqueued before it) ran.

    Fetches one element of the first array leaf via a cached jitted
    reducer; returns it as float (handy as a side-channel check).
    """
    leaf = _first_array_leaf(out)
    key = (tuple(leaf.shape), str(leaf.dtype))
    g = _SYNC_CACHE.get(key)
    if g is None:
        g = jax.jit(
            lambda x: jnp.asarray(x).ravel()[:1].astype(jnp.float32)[0]
        )
        _SYNC_CACHE[key] = g
    return float(np.asarray(g(leaf)))


def fetch_overhead(out: Any, reps: int = 3) -> float:
    """Seconds per sync() on an already-materialised buffer."""
    sync(out)  # materialise + warm the reducer
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(out)
    return (time.perf_counter() - t0) / reps


def timeit(
    fn: Callable, *args, n: int = 10, label: str | None = None, **kw
):
    """(ms_per_call, last_output) for n repeated independent calls."""
    out = fn(*args, **kw)  # compile + warm
    ov = fetch_overhead(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    sync(out)
    ms = max(time.perf_counter() - t0 - ov, 0.0) / n * 1e3
    if label is not None:
        print(f"{label:40s} {ms:9.2f} ms", flush=True)
    return ms, out


def timeit_chain(
    step: Callable, state0: Any, inputs: list, n: int, label: str | None = None
):
    """(ms_per_step, final_state) for a state-chained loop.

    ``step(state, *inputs[i % len(inputs)]) -> (state, aux)``. The chain
    itself serialises the device work; one closing fetch observes it.
    """
    state, _ = step(state0, *inputs[0])  # compile + warm
    ov = fetch_overhead(state)
    t0 = time.perf_counter()
    for i in range(n):
        state, _ = step(state, *inputs[i % len(inputs)])
    sync(state)
    ms = max(time.perf_counter() - t0 - ov, 0.0) / n * 1e3
    if label is not None:
        print(f"{label:40s} {ms:9.2f} ms/step", flush=True)
    return ms, state
