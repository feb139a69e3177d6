"""Interpret-mode pallas_call plumbing test for the fused whole-Miller
kernel (VERDICT r02 item 5): the REAL `pallas_call` — SMEM step-kind
schedule, VMEM coeff scratch persistence across fori_loop iterations,
pl.when dbl/add gating, f/r output-ref state — runs through the Pallas
interpreter over a 3-step schedule and is compared against the identical
step sequence spelled with the jnp tower/pairing ops.

The step formulas themselves are pinned by test_pallas_fused (emulated
KCtx) and by the TPU-side Miller golden vector; what is new here is that
the Mosaic-facing wiring executes in CI.  Cold compile is ~10-15 min
(one-time; persistently cached), warm runs are seconds.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np

from bn254_tpu import groups as G
from bn254_tpu import pairing_jax as PJ
from bn254_tpu import pallas_fused as PF
from bn254_tpu import tower as T
from bn254_tpu.fields import FQ
from bn254_tpu.spec import constants as C
from bn254_tpu.spec import group as SG

SEED = 0x3117
B = 128


def _eq_tree(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_miller_kernel_interpret():
    """miller_precompute's pallas_call over the schedule [dbl, add Q,
    add -Q] (every step kind) vs the jnp spelling of the same steps."""
    rng = random.Random(SEED)
    ops1, gen1 = SG.G1_PARAMS[0], SG.G1_PARAMS[1]
    ops2, gen2 = SG.G2_PARAMS[0], SG.G2_PARAMS[1]
    qpts = [SG.to_affine(SG.scalar_mul((gen2[0], gen2[1], ops2.one),
                                       3 + i, ops2), ops2)
            for i in range(B)]
    ppts = [SG.to_affine(SG.scalar_mul((gen1[0], gen1[1], ops1.one),
                                       7 + i, ops1), ops1)
            for i in range(B)]
    qa = (T.fq2_encode([p[0] for p in qpts]),
          T.fq2_encode([p[1] for p in qpts]))
    pa = (jnp.asarray(FQ.encode([p[0] for p in ppts])),
          jnp.asarray(FQ.encode([p[1] for p in ppts])))

    kinds = np.array([[0], [1], [2]], dtype=np.int32)

    PF.set_interpret(True)
    try:
        got_f, got_r = PF.miller_precompute(qa, pa, kinds)
    finally:
        PF.set_interpret(False)

    # identical sequence on the jnp path (pairing_jax step functions)
    two_inv = FQ.const(pow(2, C.Q - 2, C.Q), B)
    q_neg = (qa[0], T.fq2_neg(qa[1]))
    r = (qa[0], qa[1], T.fq2_ones(B))
    f = T.fq12_ones(B)
    for kind in kinds[:, 0]:
        if kind == 0:
            f = T.fq12_sqr(f)
            r, c = PJ._doubling_step(r, two_inv)
        else:
            r, c = PJ._addition_step(r, qa if kind == 1 else q_neg)
        f = T.fq12_mul_by_024(f, c[0], T.fq2_scale(c[2], pa[0]),
                              T.fq2_scale(c[1], pa[1]))

    _eq_tree(got_f, f)
    _eq_tree(got_r, r)
