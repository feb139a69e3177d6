"""Montgomery-mul throughput microbenchmark (in-kernel chain).

Times a dependency chain of CHAIN Fq muls (and sqrs) inside ONE kernel so
dispatch and HBM traffic amortize away and the number measures the mul
body itself.  Run on the TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_mont.py

History: the original KCtx spelling kept a [2N, S, 128] VMEM scratch and
accumulated into strided row slices — it measured 0.14 G muls/s in-chain
(strided RMW slice traffic).  The limb-list spelling (per-limb vregs,
sequential carries — pallas_kernels style) replaced it; this script
records its in-chain rate.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/bn254_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bn254_tpu import limbs as L
from bn254_tpu import pallas_fused as PF
from bn254_tpu.fields import FQ

N = L.N_LIMBS
CHAIN = 64


@functools.lru_cache(maxsize=None)
def _chain_call(impl: str, batch: int, chain: int, tile_s: int = 8):
    mod = PF._fq_mod()

    def kernel(a_ref, b_ref, out_ref):
        K = PF.KCtx(mod)
        op = getattr(K, impl)
        b = PF._fq_of(b_ref, 0)
        PF._store_fq(out_ref, 0, PF._fq_of(a_ref, 0))

        def body(i, carry):
            cur = PF._fq_of(out_ref, 0)
            PF._store_fq(out_ref, 0,
                         op(cur) if impl == "sqr" else op(cur, b))
            return carry

        jax.lax.fori_loop(0, chain, body, 0)

    sub = tile_s
    while batch % (sub * 128) and sub > 1:
        sub //= 2
    grid = batch // (sub * 128)
    spec = pl.BlockSpec((1, N, sub, 128), lambda i: (0, 0, i, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, N, batch // 128, 128),
                                       jnp.uint32),
        grid=(grid,),
        in_specs=[spec, spec],
        out_specs=spec,
    )

    def run(a, b):
        r3 = lambda x: x.reshape(1, N, batch // 128, 128)
        return call(r3(a), r3(b)).reshape(N, batch)

    return run


def main():
    import random

    print("devices:", jax.devices())
    rng = random.Random(3)
    from bn254_tpu.spec.constants import Q

    batch = 32768
    av = [rng.randrange(Q) for _ in range(batch)]
    bv = [rng.randrange(Q) for _ in range(batch)]
    a = jnp.asarray(FQ.encode(av))
    b = jnp.asarray(FQ.encode(bv))

    # Timing methodology (axon): block_until_ready is a SHALLOW ack over
    # the tunnel — it does NOT wait for device completion.  Honest timing =
    # chain the output into the next dispatch (defeats any memoization and
    # forces sequential execution) and END with a host transfer of one
    # element; subtract the no-work transfer RTT measured the same way.
    def rtt_baseline(fn, a, b):
        out = fn(a, b)
        np.asarray(out[0, 0])                      # settle
        t0 = time.time()
        np.asarray(out[0, 0])
        return time.time() - t0

    for impl in ("mul", "mul_cios", "sqr"):
        fn = _chain_call(impl, batch, CHAIN)
        t0 = time.time()
        np.asarray(fn(a, b)[0, 0])                 # compile + settle
        compile_s = time.time() - t0
        rtt = rtt_baseline(fn, a, b)
        iters = 64
        t0 = time.time()
        out = a
        for _ in range(iters):
            out = fn(out, b)
        np.asarray(out[0, 0])
        dt = (time.time() - t0 - rtt) / iters
        rate = batch * CHAIN / dt
        print(f"{impl:8s}: {rate/1e9:.2f} G ops/s "
              f"(chain {CHAIN}, batch {batch}, {dt*1e3:.2f} ms/iter, "
              f"rtt {rtt*1e3:.0f} ms, compile {compile_s:.0f}s)")

    # correctness: in Montgomery form a chain of CHAIN muls by b computes
    # the field value a * b^CHAIN — check against python ints
    want_vals = [x * pow(y, CHAIN, Q) % Q for x, y in zip(av, bv)]
    want = np.asarray(FQ.encode(want_vals))
    for impl in ("mul", "mul_cios"):
        got = np.asarray(_chain_call(impl, batch, CHAIN)(a, b))
        assert (got == want).all(), impl + " chain diverges from spec"
    got_s = np.asarray(_chain_call("sqr", batch, CHAIN)(a, b))
    want_s = np.asarray(FQ.encode(
        [pow(x, 1 << CHAIN, Q) for x in av]))
    assert (got_s == want_s).all(), "sqr chain diverges from spec"
    print("bit-exact vs spec ints: OK")


if __name__ == "__main__":
    main()
