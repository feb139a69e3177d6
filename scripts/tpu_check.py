"""On-hardware (TPU) validation of the fused pairing path.

Run from the repo root (axon backend registration needs cwd=/root/repo):

    python scripts/tpu_check.py

Checks, all on the real chip through the fused Pallas kernels:
  1. exp_by_neg_z golden vector (fields/mod.rs:229-344) — exercises the
     formula-pinned binary ladder (pl.when digit skip) on a NON-unitary
     input, all batch lanes.
  2. NAF-conjugation ladder (fq12_cyclotomic_pow_z_unitary) vs the
     formula ladder AND the spec oracle on unitary inputs.
  3. Reduced-pairing golden (groups/mod.rs:928-999) end-to-end through
     the new final exponentiation.
  4. Batch pairing vs the spec oracle on random pairs.
"""

import random
import sys
import time

sys.path.insert(0, "tests")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/bn254_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import golden
from bn254_tpu import groups as G
from bn254_tpu import pairing_jax as P
from bn254_tpu import tower as T
from bn254_tpu.fields import FQ
from bn254_tpu.spec import field as SF
from bn254_tpu.spec import group as SG
from bn254_tpu.spec.constants import Q, R

B = 128


def main():
    print("devices:", jax.devices())

    # -- 1. exp_by_neg_z golden (non-unitary input, binary ladder) -----
    t0 = time.time()
    orig = T.fq12_encode([golden.CYCLOTOMIC_EXP_ORIG] * B)
    out = jax.jit(T.fq12_exp_by_neg_z)(orig)
    dec = T.fq12_decode(out)
    assert dec[0] == golden.CYCLOTOMIC_EXP_EXPECTED, "exp_by_neg_z golden"
    assert all(d == dec[0] for d in dec), "lane divergence"
    print(f"1. exp_by_neg_z golden OK ({time.time()-t0:.1f}s)")

    # -- 2. unitary NAF ladder ----------------------------------------
    t0 = time.time()
    rng = random.Random(0xC1C)
    xs = [tuple2_rand_fq12(rng) for _ in range(B)]
    # easy-part map x -> x^((q^6-1)(q^2+1)): lands in the cyclotomic
    # subgroup G_phi6(q^2), where Granger-Scott squaring is a true square
    # and conjugation is the inverse — mere unitarity (x^(q^6-1)) is NOT
    # enough for the former.
    def easy(x):
        c = SF.fq12_mul(SF.fq12_conj(x), SF.fq12_inv(x))
        return SF.fq12_mul(SF.fq12_frob(c, 2), c)

    us = [easy(x) for x in xs]
    for u in us[:4]:
        assert SF.fq12_mul(SF.fq12_conj(u), u) == SF.FQ12_ONE
    ud = T.fq12_encode(us)
    got_naf = T.fq12_decode(jax.jit(T.fq12_exp_by_neg_z_unitary)(ud))
    got_bin = T.fq12_decode(jax.jit(T.fq12_exp_by_neg_z)(ud))
    want = [SF.fq12_exp_by_neg_z(u) for u in us]
    assert got_bin == want, "binary ladder vs spec"
    assert got_naf == want, "NAF ladder vs spec"
    print(f"2. unitary NAF ladder OK ({time.time()-t0:.1f}s)")

    # -- 2b. Miller-loop golden (fused whole-loop kernel) -------------
    t0 = time.time()
    p = SG.scalar_mul((SG.G1_PARAMS[1][0], SG.G1_PARAMS[1][1],
                       SG.G1_PARAMS[0].one), golden.MILLER_G1_SCALAR,
                      SG.G1_PARAMS[0])
    q = SG.scalar_mul((SG.G2_PARAMS[1][0], SG.G2_PARAMS[1][1],
                       SG.G2_PARAMS[0].one), golden.MILLER_G2_SCALAR,
                      SG.G2_PARAMS[0])
    pd = G.encode_points(G.G1, [p] * B)
    qd = G.encode_points(G.G2, [q] * B)
    fm = jax.jit(lambda a, b: P.miller_loop_batch(b, a, keep_batch=True))(
        pd, qd)
    # product over B identical lanes = golden^B
    want_m = SF.fq12_pow(golden.MILLER_EXPECTED, B)
    assert T.fq12_decode(fm)[0] == want_m, "miller batch golden"
    print(f"2b. fused Miller golden OK ({time.time()-t0:.1f}s)")

    # -- 3. reduced pairing golden ------------------------------------
    t0 = time.time()
    p = SG.scalar_mul((SG.G1_PARAMS[1][0], SG.G1_PARAMS[1][1],
                       SG.G1_PARAMS[0].one), golden.MILLER_G1_SCALAR,
                      SG.G1_PARAMS[0])
    q = SG.scalar_mul((SG.G2_PARAMS[1][0], SG.G2_PARAMS[1][1],
                       SG.G2_PARAMS[0].one), golden.MILLER_G2_SCALAR,
                      SG.G2_PARAMS[0])
    # batch 128: golden pair in lane 0, random pairs beyond
    rng = random.Random(0xB128)
    ps = [p] + [SG.scalar_mul((SG.G1_PARAMS[1][0], SG.G1_PARAMS[1][1],
                               SG.G1_PARAMS[0].one),
                              rng.randrange(1, R), SG.G1_PARAMS[0])
                for _ in range(B - 1)]
    qs = [q] + [SG.scalar_mul((SG.G2_PARAMS[1][0], SG.G2_PARAMS[1][1],
                               SG.G2_PARAMS[0].one),
                              rng.randrange(1, R), SG.G2_PARAMS[0])
                for _ in range(B - 1)]
    outp = jax.jit(P.pairing)(G.encode_points(G.G1, ps),
                              G.encode_points(G.G2, qs))
    decp = T.fq12_decode(outp)
    assert decp[0] == golden.REDUCED_PAIRING_EXPECTED, "reduced pairing"
    print(f"3. reduced-pairing golden OK ({time.time()-t0:.1f}s)")

    # -- 4. random lanes vs spec --------------------------------------
    t0 = time.time()
    for i in (1, 7, 100, 127):
        assert decp[i] == SG.pairing(ps[i], qs[i]), f"lane {i} vs spec"
    print(f"4. random lanes vs spec OK ({time.time()-t0:.1f}s)")

    # -- 5. fused GLV ladder kernel vs the double-and-add oracle ------
    from bn254_tpu import glv
    from bn254_tpu import limbs as L

    for name, K, PARAMS in (("G1", G.G1, SG.G1_PARAMS),
                            ("G2", G.G2, SG.G2_PARAMS)):
        t0 = time.time()
        ops, gen = PARAMS[0], PARAMS[1]
        gpt = (gen[0], gen[1], ops.one)
        rng = random.Random(0x61F0 + (0 if name == "G1" else 1))
        pts = [SG.scalar_mul(gpt, rng.randrange(1, R), ops)
               for _ in range(B)]
        pts[0] = SG.zero(ops)
        ks = [rng.randrange(R) for _ in range(B)]
        ks[1], ks[2], ks[3] = 0, 1, R - 1
        out = glv.scalar_mul_glv(K, G.encode_points(K, pts),
                                 jnp.asarray(L.stack_ints(ks)))
        dec = G.decode_points(K, jax.tree.map(np.asarray, out))
        for i in (0, 1, 2, 3, 77, 127):
            assert SG.eq(dec[i], SG.scalar_mul(pts[i], ks[i], ops),
                         ops), (name, i)
        print(f"5. fused GLV ladder {name} vs oracle OK "
              f"({time.time()-t0:.1f}s)")

    print("ALL TPU CHECKS PASS")


def tuple2_rand_fq12(rng):
    def fq2():
        return (rng.randrange(Q), rng.randrange(Q))

    return ((fq2(), fq2(), fq2()), (fq2(), fq2(), fq2()))


if __name__ == "__main__":
    main()
