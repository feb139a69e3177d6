"""Interpret-mode pallas_call plumbing test for the MSM bucket
mega-kernel (VERDICT r02 item 5): the REAL `msm_accumulate` pallas_call —
(W, m) sequential grid, VMEM bucket-scratch persistence across the inner
point sweep, i==0 zeroing / i==m-1 in-kernel running-sum reduction under
pl.when, one-hot gather/scatter, SIGNED-digit bucket indexing — runs
through the Pallas interpreter at the minimum shape (W=2 windows, nb=3
buckets, m=2 point tiles) and is checked per-lane against the spec
oracle's bucket math.

The madd/add formulas are pinned elsewhere (emulated-KCtx tests + native
C oracle on TPU); this pins the WIRING.  Cold XLA:CPU compile is tens of
minutes (one-time; persistently cached per machine), warm runs are
seconds — hence ONE test, at the production signed=True configuration.
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


def test_msm_accumulate_kernel_interpret_signed():
    """SIGNED digits (ADVICE r03) — the unconditional TPU production
    path since round 3 — through the real pallas_call: the in-kernel
    |d| bucket indexing and y-negation for d < 0, plus the pre-existing
    wiring (W-window grid, bucket-scratch persistence, i==0 zeroing /
    i==m-1 reduction under pl.when, one-hot gather/scatter, discard
    bucket, coincide patch).  Digits cover the full signed range for
    c=2: -(2^(c-1)-1) = -1 through the +2^(c-1) = +2 boundary digit
    (nb = 2^(c-1)+1 = 3 buckets incl. discard).

    This replaced the unsigned-digit variant (one ~hour-scale XLA:CPU
    interpret compile per (shape, signed) key — and unsigned
    msm_accumulate no longer has a production caller)."""
    rng = random.Random(SEED + 1)
    ops, gen = SG.G1_PARAMS[0], SG.G1_PARAMS[1]
    g = (gen[0], gen[1], ops.one)
    nb = 3                                   # c=2 signed: |d| in [0, 2]

    pool = [SG.to_affine(SG.scalar_mul(g, 2 + i, ops), ops)
            for i in range(17)]
    idx = [rng.randrange(len(pool)) for _ in range(N_PTS)]
    for lane in range(0, 64):               # dup same-bucket lanes
        idx[LANES + lane] = idx[lane]
    pts = [pool[i] for i in idx]

    digits = np.array([[rng.randrange(-(nb - 2), nb) for _ in range(N_PTS)]
                       for _ in range(W)], dtype=np.int32)
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
    _check_vs_oracle(np.asarray(totals), digits, pts, W, nb, ops,
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
