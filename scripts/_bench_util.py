"""Trustworthy micro-benchmark timing for the remote (axon) TPU backend.

The remote runtime can report buffer readiness before device execution
finishes, so the usual dispatch-loop + ``block_until_ready`` pattern can
time DISPATCH only (bench.py once read 407 "it/s"; profile_flash_ab once
read 1.6 ms for a UNet forward that costs ~40 ms). The robust pattern:

* repeat the op K times INSIDE one jitted ``lax.fori_loop`` whose carry
  feeds the next iteration's input (no CSE, no hoisting, strict serial
  execution on device), and
* force completion by fetching a scalar to the host, subtracting a
  measured fetch round-trip baseline.

``body(carry)`` must take an int32 scalar, thread it into the op's input
(e.g. ``x.at[0].set(carry)``), and derive the next carry from the op's
OUTPUT (so iteration i+1 depends on iteration i's result).
"""
import time


def fetch_rtt(n: int = 5) -> float:
    """Seconds for one trivial-program dispatch + host scalar fetch."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def null_prog(c):
        return c + 1

    c = null_prog(jnp.int32(0))
    int(c)
    t0 = time.time()
    for _ in range(n):
        c = null_prog(c)
        int(c)
    return (time.time() - t0) / n


def time_op(body, K: int = 30, rtt: float = None) -> float:
    """ms per op for ``body`` (see module docstring for the contract)."""
    import jax
    import jax.numpy as jnp

    if rtt is None:
        rtt = fetch_rtt()

    @jax.jit
    def prog(c0):
        return jax.lax.fori_loop(0, K, lambda i, c: body(c), c0)

    c = prog(jnp.int32(1))   # compile + warm
    int(c)
    t0 = time.time()
    c = prog(c)
    int(c)                   # host fetch forces completion
    total = time.time() - t0
    return max(total - rtt, 0.0) / K * 1e3
