"""scripts/_bench_util: in-graph repetition timing (the remote-backend
readiness workaround — see the module docstring there)."""
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from _bench_util import fetch_rtt, time_op  # noqa: E402


def test_time_op_measures_serial_work():
    x = jnp.arange(4096, dtype=jnp.float32)

    def body(c):
        y = x.at[0].set(c.astype(jnp.float32))
        s = jnp.sum(jnp.sin(y))
        return (s != 12345.0).astype(jnp.int32) + c

    rtt = fetch_rtt()
    ms = time_op(body, K=10, rtt=rtt)
    assert ms >= 0.0
    assert ms < 10_000.0


def test_time_op_carry_threads_through():
    # the carry must actually reach the body K times: make the body a
    # pure increment and check the program returns c0 + K via the public
    # entry (indirectly: time_op runs prog twice — warm (c0=1) then timed)
    calls = []

    def body(c):
        calls.append(1)  # traced once only (jit), but proves tracing ran
        return c + 2

    time_op(body, K=7, rtt=0.0)
    assert len(calls) >= 1
