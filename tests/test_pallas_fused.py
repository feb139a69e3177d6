"""Interpret-mode verification of EVERY fused Pallas kernel against the
jnp limb/tower path (VERDICT r01 item 5).

The fused kernels (bn254_tpu/pallas_fused.py, pallas_kernels.py) are the
production TPU compute path; on CPU they normally never execute.  Here
each kernel runs through the Pallas interpreter at batch 128 and must
agree bit-for-bit with the plain jnp implementations on random AND edge
operands (0, 1, q-1, equal points, infinities, P + (-P)).
"""

import random

import numpy as np
import pytest

import jax

from bn254_tpu import groups as G
from bn254_tpu import limbs as L
from bn254_tpu import pallas_fused as PF
from bn254_tpu import pallas_kernels as PK
from bn254_tpu import tower as T
from bn254_tpu.fields import FQ
from bn254_tpu.spec import group as SG
from bn254_tpu.spec.constants import Q, Z

SEED = 0xFA5ED
B = 128  # minimum fused-kernel batch


@pytest.fixture(autouse=True)
def _interpret_mode():
    PF.set_interpret(True)
    yield
    PF.set_interpret(False)


def _fq_vals(rng, n):
    edge = [0, 1, Q - 1, Q - 2, 2]
    return [rng.randrange(Q) for _ in range(n - len(edge))] + edge


def _fq2_vals(rng, n):
    vals = [(rng.randrange(Q), rng.randrange(Q)) for _ in range(n - 4)]
    return vals + [(0, 0), (1, 0), (0, 1), (Q - 1, Q - 1)]


def _fq12_vals(rng, n):
    def f6():
        return tuple((rng.randrange(Q), rng.randrange(Q)) for _ in range(3))
    return [(f6(), f6()) for _ in range(n)]


def _eq_tree(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_mont_mul_sqr_kernels():
    rng = random.Random(SEED)
    a = FQ.encode(_fq_vals(rng, B))
    b = FQ.encode(_fq_vals(rng, B))
    _eq_tree(PK.mont_mul(a, b, FQ.mod, interpret=True),
             L.mont_mul(a, b, FQ.mod))
    _eq_tree(PK.mont_sqr(a, FQ.mod, interpret=True),
             L.mont_sqr(a, FQ.mod))


def test_fq2_mul_sqr_kernels():
    rng = random.Random(SEED + 1)
    av, bv = _fq2_vals(rng, B), _fq2_vals(rng, B)
    a, b = T.fq2_encode(av), T.fq2_encode(bv)
    _eq_tree(PK.fq2_mul(a, b, FQ.mod, interpret=True), _jnp_fq2_mul(a, b))
    _eq_tree(PK.fq2_sqr(a, FQ.mod, interpret=True), _jnp_fq2_sqr(a))
    # fused-module variants
    _eq_tree(PF.fq2_mul(a, b), _jnp_fq2_mul(a, b))
    _eq_tree(PF.fq2_sqr(a), _jnp_fq2_sqr(a))


def _jnp_fq2_mul(a, b):
    aa = FQ.mul(a[0], b[0])
    bb = FQ.mul(a[1], b[1])
    cross = FQ.mul(FQ.add(a[0], a[1]), FQ.add(b[0], b[1]))
    return (FQ.sub(aa, bb), FQ.sub(FQ.sub(cross, aa), bb))


def _jnp_fq2_sqr(a):
    ab = FQ.mul(a[0], a[1])
    t = FQ.mul(FQ.add(a[0], a[1]), FQ.sub(a[0], a[1]))
    return (t, FQ.add(ab, ab))


def test_fq12_mul_sqr_cyc_kernels():
    rng = random.Random(SEED + 2)
    av, bv = _fq12_vals(rng, B), _fq12_vals(rng, B)
    a, b = T.fq12_encode(av), T.fq12_encode(bv)
    _eq_tree(PF.fq12_mul(a, b), T.fq12_mul(a, b))
    _eq_tree(PF.fq12_sqr(a), T.fq12_sqr(a))
    _eq_tree(PF.fq12_cyclotomic_sqr(a), T.fq12_cyclotomic_sqr(a))


def test_fold_line_kernel():
    rng = random.Random(SEED + 3)
    f = T.fq12_encode(_fq12_vals(rng, B))
    coeff = tuple(T.fq2_encode(_fq2_vals(rng, B)) for _ in range(3))
    px = FQ.encode(_fq_vals(rng, B))
    py = FQ.encode(_fq_vals(rng, B))
    got = PF.fq12_fold_line(f, coeff, px, py)
    want = T.fq12_mul_by_024(f, coeff[0], T.fq2_scale(coeff[2], px),
                             T.fq2_scale(coeff[1], py))
    _eq_tree(got, want)


def test_g2_step_kernels():
    rng = random.Random(SEED + 4)
    # random G2 Jacobian points (scaled generators) + an affine base
    ops2, gen2 = SG.G2_PARAMS[0], SG.G2_PARAMS[1]
    pts = [SG.scalar_mul((gen2[0], gen2[1], ops2.one), 3 + i, ops2)
           for i in range(B)]
    r = G.encode_points(G.G2, pts)
    base_pts = [SG.to_affine(SG.scalar_mul((gen2[0], gen2[1], ops2.one),
                                           5 + i, ops2), ops2)
                for i in range(B)]
    base = (T.fq2_encode([p[0] for p in base_pts]),
            T.fq2_encode([p[1] for p in base_pts]))

    import bn254_tpu.pairing_jax as PJ
    two_inv = FQ.const(pow(2, Q - 2, Q), B)
    got_r, got_c = PF.g2_dbl_step(r)
    want_r, want_c = PJ._doubling_step(r, two_inv)
    _eq_tree(got_r, want_r)
    _eq_tree(got_c, want_c)

    got_r, got_c = PF.g2_add_step(r, base)
    want_r, want_c = PJ._addition_step(r, base)
    _eq_tree(got_r, want_r)
    _eq_tree(got_c, want_c)


def _edge_point_batch(K, Kspec, gen_spec, n):
    """Points incl. infinity and repeated values for the add branch cases."""
    ops = Kspec
    pts = [SG.scalar_mul((gen_spec[0], gen_spec[1], ops.one), 2 + i, ops)
           for i in range(n)]
    pts[0] = SG.zero(ops)                     # infinity
    pts[1] = pts[2]                           # equal points (doubling branch)
    return pts


def test_point_add_double_kernels():
    for coords, K, P in ((1, G.G1, SG.G1_PARAMS), (2, G.G2, SG.G2_PARAMS)):
        ops, gen = P[0], P[1]
        pts = _edge_point_batch(K, ops, gen, B)
        qts = list(pts)
        qts[3] = SG.neg(pts[3], ops)          # P + (-P) -> infinity
        qts[4] = SG.zero(ops)                 # Q at infinity
        p = G.encode_points(K, pts)
        q = G.encode_points(K, qts)
        _eq_tree(PF.point_add(coords, p, q), _jnp_add(K, p, q))
        _eq_tree(PF.point_double(coords, p), _jnp_double(K, p))


def _jnp_add(K, p, q):
    from bn254_tpu.fields import set_pallas
    set_pallas(False)
    try:
        return G.add(K, p, q)
    finally:
        set_pallas(None)


def _jnp_double(K, p):
    from bn254_tpu.fields import set_pallas
    set_pallas(False)
    try:
        return G.double(K, p)
    finally:
        set_pallas(None)


def test_pow_ladder_kernels():
    rng = random.Random(SEED + 5)
    a = FQ.encode(_fq_vals(rng, B))
    # Fermat-inverse exponent: the hot use of fq_pow
    got = PF.fq_pow(a, Q - 2)
    from bn254_tpu.fields import set_pallas
    set_pallas(False)
    try:
        want = FQ.pow_const(a, Q - 2)
    finally:
        set_pallas(None)
    _eq_tree(got, want)

    f = T.fq12_encode(_fq12_vals(rng, B))
    got12 = PF.fq12_cyclotomic_pow_z(f)
    # jnp ladder (same found_one schedule)
    res = f
    for i in reversed(range(Z.bit_length() - 1)):
        res = T.fq12_cyclotomic_sqr(res)
        if (Z >> i) & 1:
            res = T.fq12_mul(f, res)
    _eq_tree(got12, res)
