"""Tile-size (BN254_TILE_S) x batch experiment for the fused pairing.

Motivation: at the default tile (sub=8 sublanes) every step of the
Montgomery carry chain is ONE vreg op, so the chain is latency-bound;
sub=16/32 gives each chain step 2/4 independent vregs of ILP.  This
harness measures whether that wins on real hardware.

Run ONE config per process (the tile is read at import):

    BN254_TILE_S=16 python scripts/bench_tile.py 8192

Prints the reduced-pairing golden check (correctness gate at the
experimental tile) and honest v2-timed pairings/s at the given batch.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/bn254_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, "tests")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    import golden
    from bn254_tpu import groups as G
    from bn254_tpu import pairing_jax as PJ
    from bn254_tpu import pallas_fused as PF
    from bn254_tpu import tower as T
    from bn254_tpu.spec import group as SG

    print(f"devices: {jax.devices()}  tile_s={PF._TILE_S}  batch={batch}")

    # correctness gate: reduced-pairing golden in lane 0 at THIS tile
    p = SG.scalar_mul((SG.G1_PARAMS[1][0], SG.G1_PARAMS[1][1],
                       SG.G1_PARAMS[0].one), golden.MILLER_G1_SCALAR,
                      SG.G1_PARAMS[0])
    q = SG.scalar_mul((SG.G2_PARAMS[1][0], SG.G2_PARAMS[1][1],
                       SG.G2_PARAMS[0].one), golden.MILLER_G2_SCALAR,
                      SG.G2_PARAMS[0])
    pd = G.encode_points(G.G1, [p] * batch)
    qd = G.encode_points(G.G2, [q] * batch)
    t0 = time.time()
    out = jax.jit(PJ.pairing)(pd, qd)
    dec = T.fq12_decode(jax.tree.map(np.asarray, out))
    assert dec[0] == golden.REDUCED_PAIRING_EXPECTED, "golden at this tile"
    assert dec[-1] == dec[0], "lane divergence"
    print(f"golden OK ({time.time()-t0:.0f}s incl. compile)")

    # v2-timed full pairing (salted inputs, digest transfer)
    pd, qd = jax.device_put((pd, qd))

    @jax.jit
    def step(p, q, salt):
        ps = jax.tree.map(lambda a: jnp.roll(a, salt, axis=-1), p)
        f = PJ.pairing(ps, q)
        return sum(jnp.sum(x, dtype=jnp.uint32) for x in jax.tree.leaves(f))

    np.asarray(step(pd, qd, np.uint32(0)))
    iters = int(os.environ.get("BENCH_ITERS", "6"))
    digs = []
    t0 = time.perf_counter()
    for i in range(iters):
        digs.append(step(pd, qd, np.uint32(1 + i)))
    for d in digs:
        np.asarray(d)
    dt = time.perf_counter() - t0
    print(f"tile_s={PF._TILE_S} batch={batch}: "
          f"{batch*iters/dt:,.0f} pairings/s   ({dt/iters*1e3:.1f} ms/iter)")


if __name__ == "__main__":
    main()
