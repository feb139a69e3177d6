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

    _check_vs_oracle(totals, digits, pts, W, NB, ops, signed=False)


def test_msm_accumulate_kernel_interpret_signed():
    """Signed-digit variant (ADVICE r03): the in-kernel |d| bucket
    indexing and y-negation for d < 0 (pallas_fused msm kernel `signed`
    branch — the unconditional TPU production path since round 3) run
    through the Pallas interpreter.  Digits cover the full signed range
    for c=3: -(2^(c-1)-1) = -3 through the +2^(c-1) = +4 boundary digit
    (nb = 2^(c-1)+1 = 5 buckets incl. discard)."""
    rng = random.Random(SEED + 1)
    ops, gen = SG.G1_PARAMS[0], SG.G1_PARAMS[1]
    g = (gen[0], gen[1], ops.one)
    nb = 5                                   # c=3 signed: |d| in [0, 4]
    w = 1                                    # one window bounds compile time

    pool = [SG.to_affine(SG.scalar_mul(g, 2 + i, ops), ops)
            for i in range(17)]
    idx = [rng.randrange(len(pool)) for _ in range(N_PTS)]
    for lane in range(0, 64):               # dup same-bucket lanes
        idx[LANES + lane] = idx[lane]
    pts = [pool[i] for i in idx]

    digits = np.array([[rng.randrange(-(nb - 2), nb) for _ in range(N_PTS)]
                       for _ in range(w)], dtype=np.int32)
    digits[0, :4] = 0                        # discard-bucket lanes
    digits[0, 4:8] = -(nb - 2)               # most-negative digit
    digits[0, 8:12] = nb - 1                 # +2^(c-1) boundary digit
    for lane in range(0, 64):               # same bucket for the dup pairs
        digits[0, LANES + lane] = digits[0, lane]

    from bn254_tpu.fields import FQ
    ax = jnp.asarray(FQ.encode([p[0] for p in pts]))
    ay = jnp.asarray(FQ.encode([p[1] for p in pts]))
    packed = jnp.stack([ax, ay], axis=0)

    PF.set_interpret(True)
    try:
        totals = PF.msm_accumulate(1, packed, jnp.asarray(digits), nb,
                                   signed=True)
    finally:
        PF.set_interpret(False)
    _check_vs_oracle(np.asarray(totals), digits, pts, w, nb, ops,
                     signed=True)


def _check_vs_oracle(totals, digits, pts, nwin, nb, ops, signed):
    # spec oracle: per (window, lane) running-sum of buckets
    for w in range(nwin):
        got_pts = G.decode_points(
            G.G1, (jnp.asarray(totals[w, 0]), jnp.asarray(totals[w, 1]),
                   jnp.asarray(totals[w, 2])))
        for lane in range(LANES):
            buckets = [SG.zero(ops) for _ in range(nb)]
            for step in range(M_TILES):
                i = step * LANES + lane
                d = int(digits[w, i])
                b = abs(d) if signed else d
                if b:
                    p = (pts[i][0], pts[i][1], ops.one)
                    if signed and d < 0:
                        p = SG.neg(p, ops)
                    buckets[b] = SG.add(buckets[b], p, ops)
            want = SG.zero(ops)
            acc = SG.zero(ops)
            for b in range(nb - 1, 0, -1):
                acc = SG.add(acc, buckets[b], ops)
                want = SG.add(want, acc, ops)
            assert SG.eq(got_pts[lane], want, ops), (w, lane)
