"""Device->host transfer discipline.

On tunneled/remote TPU runtimes two pathologies exist:
  1. fetching an in-flight array (bare np.asarray) can deadlock;
  2. even a synchronized fetch occasionally wedges (observed ~50% of
     cold fetches on the axon tunnel), while a *re-dispatched*
     computation + fresh fetch then succeeds within seconds.

``to_host`` therefore (a) synchronizes first, (b) runs the copy in a
watchdog thread with a timeout, (c) retries. ``robust_call`` goes one
step further and re-dispatches the whole jitted call between retries —
use it around hot per-batch device steps in pipeline drivers.

A wedged fetch leaks one blocked daemon thread; that is acceptable and
bounded by the retry count.
"""

from __future__ import annotations

import queue
import threading

import jax
import numpy as np

# generous defaults: tunneled runtimes show minutes-long server-side
# stalls where retries only queue behind the wedged transfer — patience
# beats re-dispatch (observed up to ~2 min on the axon tunnel).
FETCH_TIMEOUT_S = 300.0
FETCH_RETRIES = 3


class DeviceFetchTimeout(RuntimeError):
    pass


def tunneled_runtime():
    """True when the device backend is a remote tunnel (the 'axon'
    experimental platform): D2H there runs at single-digit MB/s while
    H2D runs hundreds, so spending device FLOPs or host cycles to
    shrink fetches pays. On a real PCIe host dense fetches are
    near-free and the packed/low-res paths would only add latency."""
    try:
        return jax.default_backend() == "axon"
    except Exception:
        return False


def _fetch_once(x, timeout):
    q = queue.Queue()

    def work():
        try:
            xr = jax.block_until_ready(x)
            q.put(("ok", jax.tree.map(np.asarray, xr)))
        except Exception as e:  # pragma: no cover - runtime errors
            q.put(("err", e))

    threading.Thread(target=work, daemon=True).start()
    try:
        kind, val = q.get(timeout=timeout)
    except queue.Empty:
        return False, None
    if kind == "err":
        raise val
    return True, val


def to_host(x, timeout=FETCH_TIMEOUT_S, retries=FETCH_RETRIES):
    """Block until ready, then copy to numpy (pytree-safe), with a
    watchdog + retry against wedged transfers."""
    for attempt in range(retries):
        ok, val = _fetch_once(x, timeout)
        if ok:
            return val
        print(f"[to_host] device fetch timed out "
              f"(attempt {attempt + 1}/{retries}); retrying", flush=True)
    raise DeviceFetchTimeout(
        f"device->host fetch failed after {retries} attempts")


def robust_call(fn, *args, timeout=FETCH_TIMEOUT_S, retries=FETCH_RETRIES,
                **kwargs):
    """Call a jitted fn and fetch its result; on a wedged fetch,
    re-dispatch the computation entirely (observed to clear wedges that
    same-array refetches might not)."""
    for attempt in range(retries):
        out = fn(*args, **kwargs)
        ok, val = _fetch_once(out, timeout)
        if ok:
            return val
        print(f"[robust_call] fetch timed out; re-dispatching "
              f"(attempt {attempt + 1}/{retries})", flush=True)
    raise DeviceFetchTimeout(
        f"device call+fetch failed after {retries} attempts")


def robust_call_select(fn, *args, keys=None, timeout=FETCH_TIMEOUT_S,
                       retries=FETCH_RETRIES, **kwargs):
    """Like robust_call, but fn must return a dict and only ``keys``
    are fetched to host; the full device dict is returned alongside so
    the caller can fetch more later (e.g. a sparse-overflow fallback).
    Returns (host_subset, device_dict)."""
    for attempt in range(retries):
        out = fn(*args, **kwargs)
        sel = out if keys is None else {k: out[k] for k in keys
                                        if k in out}
        ok, val = _fetch_once(sel, timeout)
        if ok:
            return val, out
        print(f"[robust_call_select] fetch timed out; re-dispatching "
              f"(attempt {attempt + 1}/{retries})", flush=True)
    raise DeviceFetchTimeout(
        f"device call+fetch failed after {retries} attempts")


def scalar(x):
    """Fetch a device scalar safely."""
    return to_host(x).item()
