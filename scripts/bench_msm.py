"""MSM phase breakdown on TPU (VERDICT r01 item 3).

Times the full Pippenger MSM and two ablations to locate the bottleneck:

* full          — msm() as shipped
* no-scatter    — accumulation scan with the bucket gather+scatter replaced
                  by a same-shape add on a FIXED slice (measures the group
                  adds + scan overhead without random-index data movement)
* adds-only     — the accumulation adds alone, no buckets at all

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_msm.py [n_log2]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/bn254_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from bn254_tpu import groups as G
from bn254_tpu import msm as M
from bn254_tpu.fields import FR
from bn254_tpu.spec.constants import R


def _digest(out):
    """Fold a result pytree to one scalar so a host transfer forces full
    device completion (tunnel block_until_ready is a shallow ack)."""
    return sum(jnp.sum(x, dtype=jnp.uint32) for x in jax.tree.leaves(out))


def timeit(name, fn, *args, reps=3):
    g = jax.jit(lambda *a: _digest(fn(*a)))
    np.asarray(g(*args))                     # compile + settle
    t0 = time.perf_counter()
    np.asarray(g(*args))
    rtt_one = time.perf_counter() - t0       # 1 exec + transfer
    digs = [g(*args) for _ in range(reps)]
    t0 = time.perf_counter()
    digs = [g(*args) for _ in range(reps)]
    for d in digs:
        np.asarray(d)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:12s} {dt*1e3:9.1f} ms  (single {rtt_one*1e3:.1f} ms)")
    return dt


def msm_ablate(K, points, scalars, mode, c=M.WINDOW_BITS, tiles=128):
    """acc-scan-only ablations of msm()."""
    n = K.batch_of(points[0])
    m = n // tiles
    nbuckets = 1 << c
    W = (256 + c - 1) // c
    WT = W * tiles

    pts = jax.tree.map(
        lambda a: jnp.moveaxis(a.reshape(a.shape[:-1] + (m, tiles)), -2, 0),
        points)
    dgs = M._all_digits(scalars, c, W)
    dgs = jnp.moveaxis(dgs.reshape(W, m, tiles), 1, 0).reshape(m, WT)
    lane = jnp.arange(WT, dtype=jnp.int32) * nbuckets

    if mode == "no-scatter":
        def body(buckets, step):
            pt, d = step
            ptw = jax.tree.map(lambda a: jnp.tile(a, W), pt)
            cur = jax.tree.map(lambda b: b[..., :WT], buckets)
            new = G.add(K, cur, ptw)
            buckets = jax.tree.map(
                lambda b, nw: b.at[..., :WT].set(nw), buckets, new)
            return buckets, None
        init = G.zero_point(K, WT * nbuckets)
    elif mode == "adds-only":
        def body(acc, step):
            pt, d = step
            ptw = jax.tree.map(lambda a: jnp.tile(a, W), pt)
            return G.add(K, acc, ptw), None
        init = G.zero_point(K, WT)
    else:
        raise ValueError(mode)
    buckets, _ = jax.lax.scan(body, init, (pts, dgs))
    return jax.tree.map(lambda b: b[..., :1], buckets)


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = 1 << nlog
    print("devices:", jax.devices(), " n=2^%d" % nlog)
    rng = np.random.default_rng(5)
    ks = jnp.asarray(FR.encode(
        [int(rng.integers(1, 1 << 63)) for _ in range(n)]))
    # cheap point set: generator replicated then offset by doublings
    base = G.generator(G.G1, n)
    pts = G.double(G.G1, base)
    jax.block_until_ready(pts)

    full = lambda p, s: M.msm(G.G1, p, s, tiles=128)
    nos = lambda p, s: msm_ablate(G.G1, p, s, "no-scatter")
    add = lambda p, s: msm_ablate(G.G1, p, s, "adds-only")

    t_full = timeit("full", full, pts, ks)
    t_nos = timeit("no-scatter", nos, pts, ks)
    t_add = timeit("adds-only", add, pts, ks)
    print(f"points/s (full): {n/t_full/1e6:.2f} M")
    print(f"scatter/gather share: {(t_full-t_nos)/t_full:5.1%}")
    print(f"bucket-slice share:   {(t_nos-t_add)/t_full:5.1%}")


if __name__ == "__main__":
    main()
