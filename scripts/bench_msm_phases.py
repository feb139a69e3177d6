"""Phase isolation for the fused MSM: prologue (digits + batch affine
conversion) vs the bucket mega-kernel vs the epilogue (Horner + lane
fold).  Explains where 2^18's wall time goes before optimizing.

    python scripts/bench_msm_phases.py [n_log2]
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
from bn254_tpu import pallas_fused as PF
from bn254_tpu.spec.constants import R


def timed(name, fn, *args, denom=1, outer=4):
    g = jax.jit(lambda salt, *a: sum(
        jnp.sum(x, dtype=jnp.uint32) for x in jax.tree.leaves(
            fn(*jax.tree.map(lambda v: jnp.roll(v, salt, axis=-1), a)))))
    t0 = time.time()
    np.asarray(g(np.uint32(0), *args))
    comp = time.time() - t0
    digs = []
    t0 = time.perf_counter()
    for i in range(outer):
        digs.append(g(np.uint32(i + 1), *args))
    for d in digs:
        np.asarray(d)
    dt = (time.perf_counter() - t0) / outer
    print(f"{name:28s} {dt*1e3:9.1f} ms  ({denom/dt/1e6:6.2f} M/s)"
          f"   [compile {comp:.0f}s]")
    return dt


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << nlog
    print("devices:", jax.devices(), " n=2^%d" % nlog,
          " tile_s=", PF._TILE_S)
    rng = random.Random(5)
    kv = [rng.randrange(1, 1 << 253) for _ in range(n)]
    ks = jnp.asarray(L.stack_ints(kv))
    pts = G.double(G.G1, G.generator(G.G1, n))
    pts, ks = jax.device_put((pts, ks))

    K = G.G1
    c = M.MSM_FUSED_WINDOW[1]
    W = (254 + 1 + c - 1) // c

    def digits(scalars):
        return M._signed_digits(M._digits_any_c(scalars, c, W), c)

    def affine(points):
        # mirror _msm_fused's batch conversion (no padding needed: n is
        # already a lane multiple)
        inf = G.is_zero_point(K, points)
        batch = K.batch_of(points[0])
        ones_b = K.ones(batch)
        z = K.select(inf, ones_b, points[2])
        mulK = lambda a, b: K.mul(a, b)
        rev = lambda t: jax.tree.map(lambda a: jnp.flip(a, axis=-1), t)
        pre = jax.lax.associative_scan(mulK, z, axis=1)
        suf = rev(jax.lax.associative_scan(mulK, rev(z), axis=1))
        tinv = K.inv(jax.tree.map(lambda a: a[..., -1:], pre))
        tinv_b = jax.tree.map(
            lambda a: jnp.broadcast_to(a, a.shape[:-1] + (batch,)), tinv)
        idx = jnp.arange(batch)
        pre1 = K.select(idx == 0, ones_b,
                        jax.tree.map(lambda a: jnp.roll(a, 1, axis=-1), pre))
        suf1 = K.select(idx == batch - 1, ones_b,
                        jax.tree.map(lambda a: jnp.roll(a, -1, axis=-1), suf))
        zinv = K.mul(K.mul(pre1, suf1), tinv_b)
        zi2 = K.sqr(zinv)
        ax = K.mul(points[0], zi2)
        ay = K.mul(points[1], K.mul(zi2, zinv))
        return PF.pack((ax, ay))

    dgs = digits(ks)
    packed = affine(pts)
    dgs, packed = jax.device_put((jax.tree.map(np.asarray, dgs),
                                  np.asarray(packed)))

    def kernel(packed_pts, d):
        return PF.msm_accumulate(1, packed_pts, d, (1 << (c - 1)) + 1,
                                 signed=True)

    totals = jax.jit(kernel)(packed, dgs)

    def epilogue(t):
        def win(wi):
            return (t[wi][0], t[wi][1], t[wi][2])

        res = win(W - 1)
        for wi in range(W - 2, -1, -1):
            for _ in range(c):
                res = G.double(K, res)
            res = G.add(K, res, win(wi))
        lanes = PF._TILE_S * 128
        k = 1
        while k < lanes:
            shifted = jax.tree.map(lambda a: jnp.roll(a, -k, axis=-1), res)
            res = G.add(K, res, shifted)
            k *= 2
        return jax.tree.map(lambda a: a[..., :1], res)

    timed("digits", digits, ks, denom=n)
    timed("affine conversion", affine, pts, denom=n)
    timed("bucket kernel", kernel, packed, dgs, denom=n)
    timed("epilogue (horner+fold)", epilogue, totals, denom=n)
    timed("FULL msm", lambda p, s: M.msm(K, p, s), pts, ks, denom=n)


if __name__ == "__main__":
    main()
