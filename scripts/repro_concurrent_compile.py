"""Minimal repro attempt: concurrent FIRST jit compiles from threads on the
CPU client (the pattern tune.py's _FIRST_COMPILE_LOCK guards against).

Usage: python concurrent_compile_repro.py [n_threads] [n_rounds] [--suite-state]
  --suite-state: first burn ~150 varied compiles sequentially to mimic the
  long-suite process state where round 2 observed the crash.
"""
import os
import sys
import threading

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

n_threads = int(sys.argv[1]) if len(sys.argv) > 1 else 2
n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
suite_state = "--suite-state" in sys.argv


def make_fn(tag, size):
    def step(x, w):
        def body(c, _):
            y = jax.lax.conv_general_dilated(
                c, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.tanh(y) + tag * 1e-6, jnp.sum(y)
        c, s = jax.lax.scan(body, x, None, length=3)
        return c, s
    return jax.jit(step)


if suite_state:
    for i in range(150):
        sz = 4 + (i % 13)
        f = make_fn(i + 1000, sz)
        x = jnp.zeros((1, sz, sz, 3))
        w = jnp.zeros((3, 3, 3, 3))
        jax.block_until_ready(f(x, w))
    print("suite-state burn-in done", flush=True)

for r in range(n_rounds):
    errs = []

    def worker(k):
        try:
            f = make_fn(r * 100 + k, 8 + k)
            x = jnp.asarray(np.random.rand(2, 8 + k, 8 + k, 3), jnp.float32)
            w = jnp.asarray(np.random.rand(3, 3, 3, 3), jnp.float32)
            key = jax.random.PRNGKey(k)
            _ = jax.random.split(key)  # PRNG first-compile path too
            jax.block_until_ready(f(x, w))
        except Exception as e:  # noqa: BLE001
            errs.append((k, repr(e)))

    ts = [threading.Thread(target=worker, args=(k,)) for k in range(n_threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    print(f"round {r}: {'ERRORS ' + str(errs) if errs else 'ok'}", flush=True)
print("REPRO_DONE_NO_CRASH", flush=True)
