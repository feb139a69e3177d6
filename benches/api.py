"""Micro-benchmarks mirroring the reference's bench suite
(/root/reference/benches/api.rs:27-116): fr add/sub/mul/inverse,
g1/g2 add/sub/scalar-mul, fq12 mul/exp, single pairing — plus the batched
capabilities the reference lacks (batched pairing, Pippenger MSM).

Each metric is measured as batched device throughput (ops/s) at the given
batch; run on the TPU:  python benches/api.py [batch]
Writes benches/results.json and prints one line per metric.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/bn254_jax_cache_tpu"
                      if "cpu" not in os.environ.get("JAX_PLATFORMS", "")
                      else "/tmp/bn254_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    import random

    from bn254_tpu import groups as G
    from bn254_tpu import limbs as L
    from bn254_tpu import msm as M
    from bn254_tpu import pairing_jax as PJ
    from bn254_tpu import tower as T
    from bn254_tpu.fields import FQ, FR
    from bn254_tpu.spec import group as SG
    from bn254_tpu.spec.constants import Q, R

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rng = random.Random(42)

    def timeit(fn, *args, iters=8):
        args = jax.device_put(args)   # keep host numpy off the timed path
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out))
        return (time.perf_counter() - t0) / iters

    results = {}

    def report(name, dt, n=batch):
        rate = n / dt
        results[name] = rate
        print(f"{name:18s} {rate:16,.0f} ops/s   ({dt*1e3:8.3f} ms/batch)",
              flush=True)

    # field element batches
    fr = FR.encode([rng.randrange(R) for _ in range(batch)])
    fq_a = FQ.encode([rng.randrange(Q) for _ in range(batch)])
    fq_b = FQ.encode([rng.randrange(Q) for _ in range(batch)])

    report("fr_add", timeit(jax.jit(FR.add), fr, fr))
    report("fr_sub", timeit(jax.jit(FR.sub), fr, fr))
    report("fr_mul", timeit(jax.jit(FR.mul), fr, fr))
    report("fr_inverse", timeit(jax.jit(FR.inv), fr))
    report("fq_mul", timeit(jax.jit(FQ.mul), fq_a, fq_b))

    # group batches (host-built from a few bases)
    def pts(K, Kspec, gen):
        base = [SG.scalar_mul((gen[0], gen[1], Kspec.one), 3 + i, Kspec)
                for i in range(4)]
        return G.encode_points(K, [base[i % 4] for i in range(batch)])

    g1 = pts(G.G1, SG.G1_PARAMS[0], SG.G1_PARAMS[1])
    g2 = pts(G.G2, SG.G2_PARAMS[0], SG.G2_PARAMS[1])
    ks = jnp.asarray(L.stack_ints([rng.randrange(R) for _ in range(batch)]))

    report("g1_add", timeit(jax.jit(lambda p, q: G.add(G.G1, p, q)), g1, g1))
    report("g1_sub", timeit(jax.jit(
        lambda p, q: G.add(G.G1, p, G.neg(G.G1, q))), g1, g1))
    report("g1_mul", timeit(jax.jit(
        lambda p, k: G.scalar_mul(G.G1, p, k)), g1, ks, iters=2))
    report("g2_add", timeit(jax.jit(lambda p, q: G.add(G.G2, p, q)), g2, g2))
    report("g2_sub", timeit(jax.jit(
        lambda p, q: G.add(G.G2, p, G.neg(G.G2, q))), g2, g2))
    report("g2_mul", timeit(jax.jit(
        lambda p, k: G.scalar_mul(G.G2, p, k)), g2, ks, iters=2))

    # fq12
    def rf12():
        def rf2():
            return (rng.randrange(Q), rng.randrange(Q))
        return (tuple(rf2() for _ in range(3)), tuple(rf2() for _ in range(3)))
    f12a = T.fq12_encode([rf12() for _ in range(batch)])
    f12b = T.fq12_encode([rf12() for _ in range(batch)])
    report("fq12_mul", timeit(jax.jit(T.fq12_mul), f12a, f12b))
    report("fq12_exp", timeit(jax.jit(T.fq12_cyclotomic_pow_z), f12a,
                              iters=2))

    # pairing (full reduced, per element)
    report("pairing", timeit(jax.jit(PJ.pairing), g1, g2, iters=2))

    # beyond the reference: MSM points/s
    msm_dt = timeit(jax.jit(lambda p, k: M.msm(G.G1, p, k)), g1, ks, iters=2)
    report("msm_g1_points", msm_dt)

    path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(path, "w") as f:
        json.dump({"batch": batch, "ops_per_s": results}, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
