"""Fused (VMEM one-hot bucket) MSM on TPU: correctness + honest timing.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_msm_fused.py [n_log2 ...]
"""

import random
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/bn254_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from bn254_tpu import groups as G
from bn254_tpu import limbs as L
from bn254_tpu import msm as M
from bn254_tpu.fields import FR
from bn254_tpu.spec import group as SG
from bn254_tpu.spec.constants import R


def main():
    import os

    sizes = [int(a) for a in sys.argv[1:]] or [16]
    print("devices:", jax.devices())
    rng = random.Random(5)

    # window override for the c sweep (BN254_MSM_C=5 etc.); default is
    # msm.MSM_FUSED_WINDOW
    c_env = os.environ.get("BN254_MSM_C")
    if c_env:
        M.MSM_FUSED_WINDOW = {1: int(c_env), 2: int(c_env)}
        print(f"window override: c={c_env}")

    # correctness first, at n=1024.  Oracle: native C Pippenger when
    # built (the pure-Python spec loop costs ~30 min of host time at
    # n=1024 — it burned half the revalidation stage's budget on
    # 2026-08-20), spec otherwise.
    n0 = 1024
    ks0 = [rng.randrange(R) for _ in range(n0 - 2)] + [0, 7]
    k0 = jnp.asarray(L.stack_ints(ks0))
    pts0 = G.scalar_mul(G.G1, G.generator(G.G1, n0), k0)
    out0 = M.msm(G.G1, pts0, k0)            # fused path (tiles=None, TPU)
    dec = G.decode_points(G.G1, jax.tree.map(np.asarray, out0))[0]
    ops1, gen = SG.G1_PARAMS[0], SG.G1_PARAMS[1]
    gpt = (gen[0], gen[1], ops1.one)
    try:
        from bn254_tpu import native as NV

        # Decode the device-generated points to host triples instead of
        # recomputing them with the pure-Python scalar_mul loop (~30 min
        # at n=1024; scalar_mul correctness is pinned by its own goldens).
        pts_host = G.decode_points(G.G1, jax.tree.map(np.asarray, pts0))
        acc = NV.msm_g1(pts_host, ks0)
        oracle = "native C"
    except (OSError, AttributeError):  # lib missing OR stale build w/o symbol
        acc = (ops1.zero, ops1.one, ops1.zero)
        for k in ks0:
            p = SG.scalar_mul(gpt, k, ops1)
            acc = SG.add(acc, SG.scalar_mul(p, k, ops1), ops1)
        oracle = "spec"
    assert SG.eq(dec, acc, ops1), "fused MSM diverges from the oracle"
    print(f"fused MSM vs {oracle} oracle (n=1024): OK")

    for nlog in sizes:
        n = 1 << nlog
        kv = [rng.randrange(1, 1 << 253) for _ in range(n)]
        ks = jnp.asarray(L.stack_ints(kv))
        pts = G.double(G.G1, G.generator(G.G1, n))
        fn = jax.jit(lambda p, s: M.msm(G.G1, p, s))

        # full-scale correctness vs the native C Pippenger oracle
        try:
            from bn254_tpu import native as NV

            dec = G.decode_points(
                G.G1, jax.tree.map(np.asarray, fn(pts, ks)))[0]
            two_g = SG.double((gen[0], gen[1], ops1.one), ops1)
            want = NV.msm_g1([two_g] * n, kv)
            assert SG.eq(dec, want, ops1), f"2^{nlog} diverges from native"
            print(f"n=2^{nlog}: bit-exact vs native C oracle")
        except OSError:
            pass  # native engine not built

        def digest(out):
            return sum(jnp.sum(x, dtype=jnp.uint32)
                       for x in jax.tree.leaves(out))

        g = jax.jit(lambda p, s, salt: digest(fn(
            jax.tree.map(lambda a: jnp.roll(a, salt, axis=-1), p), s)))
        t0 = time.time()
        np.asarray(g(pts, ks, np.uint32(0)))
        comp = time.time() - t0
        reps = 3
        digs = []
        t0 = time.perf_counter()
        for i in range(reps):
            digs.append(g(pts, ks, np.uint32(i + 1)))
        for d in digs:
            np.asarray(d)
        dt = (time.perf_counter() - t0) / reps
        print(f"n=2^{nlog}: {dt*1e3:9.1f} ms  -> {n/dt/1e6:6.2f} M points/s"
              f"   (compile {comp:.0f}s)")


if __name__ == "__main__":
    main()
