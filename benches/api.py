"""Micro-benchmarks mirroring the reference's bench suite
(/root/reference/benches/api.rs:27-116): fr add/sub/mul/inverse,
g1/g2 add/sub/scalar-mul, fq12 mul/exp, single pairing — plus the batched
capabilities the reference lacks (batched pairing, Pippenger MSM).

Methodology (v2, VERDICT r01 item 10): every metric is measured at
saturating batch as ops/s of *arithmetic*, not dispatch:

* cheap ops (add/sub/mul/inv) run INNER chained iterations inside one jit
  (x = op(x, b) via fori_loop) so per-dispatch overhead amortizes away;
* every timed run ends with a digest host transfer that data-depends on
  the whole result — on the axon tunnel backend, block_until_ready is a
  shallow ack and does NOT wait for device completion, so transfer-free
  timings are meaningless;
* inputs are salted per outer iteration (lane roll) where chaining is
  impossible (pairing, MSM), so no layer can serve memoized results.

Run on the TPU:  python benches/api.py [batch]
Writes benches/results.json and prints one line per metric.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/bn254_jax_cache_tpu"
                      if "cpu" not in os.environ.get("JAX_PLATFORMS", "")
                      else "/tmp/bn254_jax_cache_cpu_bench")
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    rng = random.Random(42)

    def digest(out):
        return sum(jnp.sum(x, dtype=jnp.uint32)
                   for x in jax.tree.leaves(out))

    def timeit(op, x, *rest, inner=1, outer=4, chain=True, salt_axis=-1):
        """ops/s denominator is inner*outer*batch; `chain` feeds the
        output back as the first operand (same pytree structure
        required).  The first operand is always rolled by the outer
        index so no two dispatches see identical inputs."""
        x = jax.device_put(x)
        rest = jax.device_put(rest)

        @jax.jit
        def step(x, salt):
            if salt_axis is not None:
                x = jax.tree.map(
                    lambda a: jnp.roll(a, salt, axis=salt_axis), x)

            def body(_, v):
                return op(v, *rest) if chain else v

            if chain and inner > 1:
                out = jax.lax.fori_loop(0, inner, body, x)
            else:
                out = op(x, *rest)
            return digest(out)

        np.asarray(step(x, np.uint32(0)))            # compile + settle
        digs = []
        t0 = time.perf_counter()
        for i in range(outer):
            digs.append(step(x, np.uint32(i % batch)))
        for d in digs:
            np.asarray(d)
        return (time.perf_counter() - t0) / (inner * outer)

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

    report("fr_add", timeit(FR.add, fr, fr, inner=64))
    report("fr_sub", timeit(FR.sub, fr, fr, inner=64))
    report("fr_mul", timeit(FR.mul, fr, fr, inner=64))
    report("fr_inverse", timeit(FR.inv, fr, inner=4))
    report("fq_mul", timeit(FQ.mul, fq_a, fq_b, inner=64))

    # group batches (host-built from a few bases)
    def pts(K, Kspec, gen):
        base = [SG.scalar_mul((gen[0], gen[1], Kspec.one), 3 + i, Kspec)
                for i in range(4)]
        return G.encode_points(K, [base[i % 4] for i in range(batch)])

    g1 = pts(G.G1, SG.G1_PARAMS[0], SG.G1_PARAMS[1])
    g2 = pts(G.G2, SG.G2_PARAMS[0], SG.G2_PARAMS[1])
    ks = jnp.asarray(L.stack_ints([rng.randrange(R) for _ in range(batch)]))

    report("g1_add", timeit(lambda p, q: G.add(G.G1, p, q), g1, g1,
                            inner=16))
    report("g1_sub", timeit(lambda p, q: G.add(G.G1, p, G.neg(G.G1, q)),
                            g1, g1, inner=16))
    report("g1_mul", timeit(lambda p, k: G.scalar_mul(G.G1, p, k), g1, ks,
                            outer=2))
    report("g2_add", timeit(lambda p, q: G.add(G.G2, p, q), g2, g2,
                            inner=16))
    report("g2_sub", timeit(lambda p, q: G.add(G.G2, p, G.neg(G.G2, q)),
                            g2, g2, inner=16))
    report("g2_mul", timeit(lambda p, k: G.scalar_mul(G.G2, p, k), g2, ks,
                            outer=2))

    # GLV fast path (half-depth joint ladder; oracle-parity in test_glv)
    from bn254_tpu import glv
    report("g1_mul_glv", timeit(lambda p, k: glv.scalar_mul_glv(G.G1, p, k),
                                g1, ks, outer=2))
    report("g2_mul_glv", timeit(lambda p, k: glv.scalar_mul_glv(G.G2, p, k),
                                g2, ks, outer=2))

    # fq12
    def rf12():
        def rf2():
            return (rng.randrange(Q), rng.randrange(Q))
        return (tuple(rf2() for _ in range(3)), tuple(rf2() for _ in range(3)))
    f12a = T.fq12_encode([rf12() for _ in range(batch)])
    f12b = T.fq12_encode([rf12() for _ in range(batch)])
    report("fq12_mul", timeit(T.fq12_mul, f12a, f12b, inner=8))
    report("fq12_exp", timeit(T.fq12_cyclotomic_pow_z, f12a, outer=2))

    # pairing (full reduced, per element; output is Fq12 so salt instead
    # of chaining)
    pair_batch = min(batch, 2048)
    g1p = jax.tree.map(lambda a: a[..., :pair_batch], g1)
    g2p = jax.tree.map(lambda a: a[..., :pair_batch], g2)
    report("pairing",
           timeit(lambda p: PJ.pairing(p, g2p), g1p,
                  chain=False, salt_axis=-1, outer=2),
           n=pair_batch)

    # beyond the reference: MSM points/s
    report("msm_g1_points",
           timeit(lambda p: M.msm(G.G1, p, ks), g1,
                  chain=False, salt_axis=-1, outer=2))

    path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(path, "w") as f:
        json.dump({"batch": batch, "ops_per_s": results,
                   "methodology": "v2: chained/salted iterations, digest "
                                  "host transfer forces completion"},
                  f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
