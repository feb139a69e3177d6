"""Interpret-mode pallas_call test for the fused GLV ladder kernel
(pallas_fused.glv_ladder) plus bit-exactness of the full fused-path
scalar_mul_glv glue vs the scan spelling.

The kernel must be BIT-identical to the lax.scan ladder (same
k_point_double/k_point_add formulas, same Jacobian representative), so
the assertion here is exact array equality, not projective equality.
Cold compile ~5 min (one-time; persistently cached), warm runs seconds.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np

from bn254_tpu import glv
from bn254_tpu import groups as G
from bn254_tpu import limbs as L
from bn254_tpu import pallas_fused as PF
from bn254_tpu.fields import set_pallas
from bn254_tpu.spec import group as SG
from bn254_tpu.spec.constants import R

SEED = 0x61F
B = 128


def _eq_tree(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_glv_ladder_kernel_interpret_matches_scan():
    rng = random.Random(SEED)
    ops, gen = SG.G1_PARAMS[0], SG.G1_PARAMS[1]
    g = (gen[0], gen[1], ops.one)
    pts = [SG.scalar_mul(g, rng.randrange(1, R), ops) for _ in range(B)]
    pts[0] = SG.zero(ops)                     # infinity input
    ks = [rng.randrange(R) for _ in range(B)]
    ks[0] = rng.randrange(R)
    ks[1] = 0                                 # zero scalar -> infinity
    ks[2] = 1
    ks[3] = R - 1

    pd = G.encode_points(G.G1, pts)
    kd = jnp.asarray(L.stack_ints(ks))

    # scan spelling (CPU default); jit-wrapped — an eager lax.scan
    # rebuilds its jaxpr per call (see groups._memo_jit)
    want = jax.jit(lambda p, k: glv.scalar_mul_glv(G.G1, p, k))(pd, kd)

    PF.set_interpret(True)
    set_pallas(True)
    try:
        got = glv.scalar_mul_glv(G.G1, pd, kd)
    finally:
        set_pallas(None)
        PF.set_interpret(False)

    _eq_tree(got, want)

    # and projective parity vs the double-and-add oracle on a few lanes
    got_dec = G.decode_points(G.G1, got)
    for i in (0, 1, 2, 3, 17):
        assert SG.eq(got_dec[i],
                     SG.scalar_mul(pts[i], ks[i], ops), ops), i
