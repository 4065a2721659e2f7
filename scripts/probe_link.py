#!/usr/bin/env python
"""Probe the axon-tunnel link health in a fresh process.

Every remote-TPU session needs this before trusting wall-clock numbers:
the tunnel's DATA plane (device_put/pull bandwidth) and COMPILE control
plane degrade independently, and several RESULTS.md measurements are
annotated with these probes (e.g. round 2's "~30 MB/s, 74 s trivial
compile" and round 4's compile-plane-down session).  Reference points on
this container:

  healthy:   put/pull 10 MB at ~30 MB/s, trivial jnp.sum compile < 10 s
  degraded:  trivial compile ~74 s (2026-08-20 session)
  hard-down: trivial compile > 12 min, no measurement possible
             (2026-08-21 session; scripts/bench_xla_flags.py attempt)

Each stage prints as it completes so a hung stage is identifiable from
partial output.  Usage: timeout 600 python scripts/probe_link.py
"""
import time

import numpy as np


def main() -> None:
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"backend_init: {time.time() - t0:6.1f}s  ({dev})", flush=True)

    mb = 10
    host = np.random.rand(mb * 1024 * 1024 // 4).astype(np.float32)
    t = time.time()
    x = jax.device_put(host, dev)
    dt = time.time() - t
    print(f"device_put {mb} MB: {dt:6.1f}s  ({mb / dt:6.1f} MB/s)",
          flush=True)
    t = time.time()
    np.asarray(x)
    dt = time.time() - t
    print(f"pull       {mb} MB: {dt:6.1f}s  ({mb / dt:6.1f} MB/s)",
          flush=True)

    t = time.time()
    s = jax.jit(jnp.sum)(x)
    float(s)  # scalar readback, the only reliable sync through the tunnel
    print(f"trivial compile+run: {time.time() - t:6.1f}s", flush=True)

    # Steady-state dispatch RTT on the now-compiled program.  The jitted
    # wrapper is hoisted so the loop times dispatch only, not wrapper
    # creation + Python cache lookup.
    f = jax.jit(jnp.sum)
    float(f(x))  # prime the wrapper's own cache
    dts = []
    for _ in range(5):
        t = time.time()
        float(f(x))
        dts.append(time.time() - t)
    print(f"warm dispatch RTT: min {min(dts) * 1e3:.0f} ms "
          f"median {sorted(dts)[2] * 1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
