"""Headline benchmark: batched reduced pairings per second on one chip.

Prints ONE JSON line:
  {"metric": "pairings_per_s", "value": N, "unit": "pairings/s",
   "vs_baseline": N / 95.8}

Baseline: the reference crate's shootout records 20,000 pairings in 208.8 s
(~95.8 pairings/s) on a single CPU thread (/root/reference/shootout/
README.md:1-5; BASELINE.md).  Each batch element here is a FULL reduced
pairing (to_affine + G2 precompute + Miller loop + final exponentiation),
the same work as the reference's `pairing()`.

Extra diagnostic metrics (Fq mul throughput, batch sweep) are written to
bench_detail.json; stdout stays a single line for the driver.
"""

import json
import os
import sys
import time

BASELINE_PAIRINGS_PER_S = 95.8


def _enable_compile_cache():
    import jax

    # NOTE: must stay distinct from the CPU-test cache (tests/conftest.py):
    # axon/TPU runs AOT-compile on a remote machine, and foreign XLA:CPU
    # AOT entries SIGILL/segfault the local test runs if they share a dir.
    jax.config.update("jax_compilation_cache_dir", "/tmp/bn254_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _rand_pairs(n, seed=7):
    import random
    from bn254_tpu import groups as G
    from bn254_tpu.spec import group as SG
    from bn254_tpu.spec.constants import R

    rng = random.Random(seed)
    ops1, gen1 = SG.G1_PARAMS[0], SG.G1_PARAMS[1]
    ops2, gen2 = SG.G2_PARAMS[0], SG.G2_PARAMS[1]
    # a few scalar-muls, then cheap doublings/additions to fill the batch
    base_p = [SG.scalar_mul((gen1[0], gen1[1], ops1.one),
                            rng.randrange(1, R), ops1) for _ in range(8)]
    base_q = [SG.scalar_mul((gen2[0], gen2[1], ops2.one),
                            rng.randrange(1, R), ops2) for _ in range(8)]
    ps, qs = [], []
    p, q = base_p[0], base_q[0]
    for i in range(n):
        p = SG.add(p, base_p[i % 8], ops1)
        q = SG.add(q, base_q[i % 8], ops2)
        ps.append(p)
        qs.append(q)
    return (G.encode_points(G.G1, ps), G.encode_points(G.G2, qs))


def main():
    import jax

    _enable_compile_cache()
    from bn254_tpu import pairing_jax as PJ

    # Batch sweep (round 5, driver-shape run): 96.7k/s @4096 ->
    # 100.7k @8192 -> 103.5k @16384 — the ~25 ms/dispatch tunnel
    # overhead amortizes and the Miller/final-exp kernels pipeline
    # across grid steps; beyond 16384 the curve is flat (compute-bound).
    batch = int(os.environ.get("BENCH_BATCH", "16384"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))

    # encode_points returns host numpy; put on device ONCE so the timed
    # loop measures compute, not repeated host->device tunnel transfers
    import numpy as np

    p, q = jax.device_put(_rand_pairs(batch))

    # Timing methodology (v2): on the axon tunnel, block_until_ready is a
    # shallow ack that does NOT wait for device completion, so each timed
    # iteration must feed the previous result forward (defeats dispatch
    # pipelining/memoization) and the run must END with a host transfer
    # that data-depends on every iteration.  A same-shape no-work transfer
    # is subtracted as the RTT baseline.
    import jax.numpy as jnp

    @jax.jit
    def step(p, q, salt):
        # rotate the G1 batch by `salt` lanes so every iteration computes
        # fresh pairings (no chance of any result memoization en route)
        ps = jax.tree.map(lambda a: jnp.roll(a, salt, axis=-1), p)
        f = PJ.pairing(ps, q)
        # fold the full result into one uint32 so the transfer depends on
        # every lane of every coefficient
        leaves = jax.tree.leaves(f)
        dig = sum(jnp.sum(x, dtype=jnp.uint32) for x in leaves)
        return dig

    # compile + settle (np.asarray forces real completion over the tunnel)
    np.asarray(step(p, q, np.uint32(0)))
    t0 = time.perf_counter()
    np.asarray(step(p, q, np.uint32(0)))
    one_exec = time.perf_counter() - t0       # one exec + transfer RTT

    digs = []
    t0 = time.perf_counter()
    for i in range(iters):
        digs.append(step(p, q, np.uint32(1 + i % (batch - 1))))
    for d in digs:
        np.asarray(d)
    dt = time.perf_counter() - t0

    pairings_per_s = batch * iters / dt

    detail = {
        "device": str(jax.devices()[0]),
        "batch": batch,
        "iters": iters,
        "wall_s": dt,
        "one_exec_plus_rtt_s": one_exec,
        "pairings_per_s": pairings_per_s,
        "methodology": "v2: per-iter salted inputs, digest host transfer "
                       "forces completion (axon block_until_ready is a "
                       "shallow ack)",
    }
    try:
        with open(os.path.join(os.path.dirname(__file__) or ".",
                               "bench_detail.json"), "w") as f:
            json.dump(detail, f, indent=2)
    except OSError:
        pass

    print(json.dumps({
        "metric": "pairings_per_s",
        "value": round(pairings_per_s, 2),
        "unit": "pairings/s",
        "vs_baseline": round(pairings_per_s / BASELINE_PAIRINGS_PER_S, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
