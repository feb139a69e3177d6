"""Pairing phase breakdown on TPU with honest (digest-transfer) timing.

Phases: to_affine + fused Miller (precompute interleaved) vs final
exponentiation; plus a batch sweep for the full reduced pairing.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_pairing.py
"""

import sys
import time

import random as pyrandom

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/bn254_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from bn254_tpu import groups as G
from bn254_tpu import pairing_jax as PJ
from bn254_tpu import tower as T
from bn254_tpu.fields import FR
from bn254_tpu.spec.constants import R


def digest(out):
    return sum(jnp.sum(x, dtype=jnp.uint32) for x in jax.tree.leaves(out))


def timed(name, fn, *args, outer=4, denom=1):
    g = jax.jit(lambda salt, *a: digest(
        fn(*jax.tree.map(lambda x: jnp.roll(x, salt, axis=-1), a))))
    np.asarray(g(np.uint32(0), *args))
    digs = []
    t0 = time.perf_counter()
    for i in range(outer):
        digs.append(g(np.uint32(i + 1), *args))
    for d in digs:
        np.asarray(d)
    dt = (time.perf_counter() - t0) / outer
    print(f"{name:24s} {dt*1e3:9.2f} ms   ({denom/dt:12,.0f} /s)")
    return dt


def main():
    print("devices:", jax.devices())
    rng = pyrandom.Random(3)

    for batch in (1024, 2048, 4096):
        ks = jnp.asarray(FR.encode(
            [rng.randrange(1, R) for _ in range(batch)]))
        g1 = G.scalar_mul(G.G1, G.generator(G.G1, batch), ks)
        g2 = G.scalar_mul(G.G2, G.generator(G.G2, batch), ks)
        g1, g2 = jax.device_put((g1, g2))
        np.asarray(jax.tree.leaves(g1)[0])

        print(f"--- batch {batch}")
        t_m = timed("miller (fused, batch)", lambda p, q: PJ.miller_loop_batch(
            q, p, keep_batch=True), g1, g2, denom=batch)

        f = PJ.miller_loop_batch(g2, g1, keep_batch=True)
        f = jax.device_put(jax.tree.map(np.asarray, f))
        t_e = timed("final_exponentiation", T.fq12_final_exponentiation, f,
                    denom=batch)
        t_p = timed("full pairing", PJ.pairing, g1, g2, denom=batch)
        print(f"    miller {t_m/t_p:5.1%}  finalexp {t_e/t_p:5.1%}  "
              f"other {(t_p-t_m-t_e)/t_p:+5.1%}")


if __name__ == "__main__":
    main()
