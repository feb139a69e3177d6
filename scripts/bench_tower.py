"""In-kernel throughput by tower level: where does the Fq-mul rate go?

Chains CHAIN iterations of each tower op inside one kernel (operands in
VMEM scratch) and reports the effective Fq-mul rate, using each op's
known Fq-mul count.  Comparing against the raw KCtx.mul chain isolates
register-pressure / spill costs of the bigger working sets.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_tower.py
"""

import functools
import random
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
from bn254_tpu.spec.constants import Q

N = L.N_LIMBS

# op name -> (n Fq coords per value, muls per op, body builder)
OPS = {
    "fq_mul":    (1, 1,  lambda K: lambda a, b: K.mul(a, b)),
    "fq2_mul":   (2, 3,  lambda K: lambda a, b: PF.kfq2_mul(K, a, b)),
    "fq2_sqr":   (2, 2,  lambda K: lambda a, b: PF.kfq2_sqr(K, a)),
    "fq6_mul":   (6, 18, lambda K: lambda a, b: PF.kfq6_mul(K, a, b)),
    "fq12_sqr":  (12, 36, lambda K: lambda a, b: PF.kfq12_sqr(K, a)),
    "fq12_mul":  (12, 54, lambda K: lambda a, b: PF.kfq12_mul(K, a, b)),
    "cyclo_sqr": (12, 18, lambda K: lambda a, b: PF.kfq12_cyclotomic_sqr(K, a)),
}


def _nest(flat, ncoords):
    """list of ncoords limb-lists -> tower pytree shape."""
    if ncoords == 1:
        return flat[0]
    if ncoords == 2:
        return (flat[0], flat[1])
    if ncoords == 6:
        return tuple((flat[2 * i], flat[2 * i + 1]) for i in range(3))
    if ncoords == 12:
        return (_nest(flat[:6], 6), _nest(flat[6:], 6))
    raise ValueError(ncoords)


def _flatten(tree, ncoords):
    if ncoords == 1:
        return [tree]
    out = []

    def rec(t):
        if isinstance(t[0], list):
            out.extend(t)
        else:
            for x in t:
                rec(x)
    rec(tree)
    return out


@functools.lru_cache(maxsize=None)
def _chain_call(which: str, batch: int, chain: int, tile_s: int = 8):
    mod = PF._fq_mod()
    ncoords, _, mk = OPS[which]

    def kernel(a_ref, b_ref, out_ref):
        K = PF.KCtx(mod)
        op = mk(K)
        b = _nest([PF._fq_of(b_ref, c) for c in range(ncoords)], ncoords)
        for c in range(ncoords):
            PF._store_fq(out_ref, c, PF._fq_of(a_ref, c))

        def body(i, carry):
            cur = _nest([PF._fq_of(out_ref, c) for c in range(ncoords)],
                        ncoords)
            nxt = op(cur, b)
            for c, v in enumerate(_flatten(nxt, ncoords)):
                PF._store_fq(out_ref, c, v)
            return carry

        jax.lax.fori_loop(0, chain, body, 0)

    sub = tile_s
    while batch % (sub * 128) and sub > 1:
        sub //= 2
    grid = batch // (sub * 128)
    spec = pl.BlockSpec((ncoords, N, sub, 128), lambda i: (0, 0, i, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ncoords, N, batch // 128, 128),
                                       jnp.uint32),
        grid=(grid,),
        in_specs=[spec, spec],
        out_specs=spec,
    )

    def run(a, b):
        r = lambda x: x.reshape(ncoords, N, batch // 128, 128)
        return call(r(a), r(b)).reshape(ncoords * N, batch)

    return run


def main():
    print("devices:", jax.devices())
    rng = random.Random(9)
    batch = 8192
    chain = 32

    for which, (ncoords, muls, _) in OPS.items():
        a = np.concatenate([np.asarray(FQ.encode(
            [rng.randrange(Q) for _ in range(batch)])) for _ in range(ncoords)])
        b = np.concatenate([np.asarray(FQ.encode(
            [rng.randrange(Q) for _ in range(batch)])) for _ in range(ncoords)])
        a = jax.device_put(jnp.asarray(a))
        b = jax.device_put(jnp.asarray(b))
        fn = _chain_call(which, batch, chain)
        t0 = time.time()
        np.asarray(fn(a, b)[0, 0])
        comp = time.time() - t0
        iters = 8
        out = a
        t0 = time.time()
        for _ in range(iters):
            out = fn(out, b)
        np.asarray(out[0, 0])
        dt = (time.time() - t0) / iters
        eff = batch * chain * muls / dt
        print(f"{which:10s}: {eff/1e9:5.2f} G Fq-muls/s "
              f"({batch*chain/dt/1e6:7.2f} M ops/s, {dt*1e3:7.2f} ms/iter, "
              f"compile {comp:.0f}s)")


if __name__ == "__main__":
    main()
