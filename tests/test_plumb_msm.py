"""Interpret-mode pallas_call plumbing test for the MSM bucket
mega-kernel (VERDICT r02 item 5): the REAL `msm_accumulate` pallas_call —
(W, m) sequential grid, VMEM bucket-scratch persistence across the inner
point sweep, i==0 zeroing / i==m-1 in-kernel running-sum reduction under
pl.when, one-hot gather/scatter — runs through the Pallas interpreter at
the minimum shape (W=2 windows, nb=4 buckets, m=2 point tiles) and is
checked per-lane against the spec oracle's bucket math.

The madd/add formulas are pinned elsewhere (emulated-KCtx tests + native
C oracle on TPU); this pins the WIRING.  Cold compile ~10 min (one-time;
persistently cached), warm runs are seconds.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np

from bn254_tpu import groups as G
from bn254_tpu import pallas_fused as PF
from bn254_tpu.spec import group as SG

SEED = 0xACC
LANES = PF._TILE_S * 128
M_TILES = 2
N_PTS = LANES * M_TILES
W = 2
NB = 4


def test_msm_accumulate_kernel_interpret():
    rng = random.Random(SEED)
    ops, gen = SG.G1_PARAMS[0], SG.G1_PARAMS[1]
    g = (gen[0], gen[1], ops.one)

    # a small pool of affine points reused across lanes (coincide-branch
    # coverage comes from lanes whose two points land in the same bucket)
    pool = [SG.to_affine(SG.scalar_mul(g, 2 + i, ops), ops)
            for i in range(17)]
    idx = [rng.randrange(len(pool)) for _ in range(N_PTS)]
    # force some duplicate-point same-bucket lanes (madd coincide branch)
    for lane in range(0, 64):
        idx[LANES + lane] = idx[lane]
    pts = [pool[i] for i in idx]

    digits = np.array([[rng.randrange(NB) for _ in range(N_PTS)]
                       for _ in range(W)], dtype=np.int32)
    digits[0, :8] = 0                       # discard-bucket lanes
    for lane in range(0, 64):               # same bucket for the dup pairs
        digits[0, LANES + lane] = digits[0, lane]

    from bn254_tpu.fields import FQ
    ax = jnp.asarray(FQ.encode([p[0] for p in pts]))
    ay = jnp.asarray(FQ.encode([p[1] for p in pts]))
    packed = jnp.stack([ax, ay], axis=0)    # [2, N, n]

    PF.set_interpret(True)
    try:
        totals = PF.msm_accumulate(1, packed, jnp.asarray(digits), NB)
    finally:
        PF.set_interpret(False)
    totals = np.asarray(totals)             # [W, 3, N, LANES]

    # spec oracle: per (window, lane) running-sum of buckets
    for w in range(W):
        got_pts = G.decode_points(
            G.G1, (jnp.asarray(totals[w, 0]), jnp.asarray(totals[w, 1]),
                   jnp.asarray(totals[w, 2])))
        for lane in range(LANES):
            buckets = [SG.zero(ops) for _ in range(NB)]
            for step in range(M_TILES):
                i = step * LANES + lane
                b = int(digits[w, i])
                if b:
                    buckets[b] = SG.add(
                        buckets[b], (pts[i][0], pts[i][1], ops.one), ops)
            want = SG.zero(ops)
            acc = SG.zero(ops)
            for b in range(NB - 1, 0, -1):
                acc = SG.add(acc, buckets[b], ops)
                want = SG.add(want, acc, ops)
            assert SG.eq(got_pts[lane], want, ops), (w, lane)
