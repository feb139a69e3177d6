"""Native host engine (native/bn254_host.c via ctypes) parity vs the spec
oracle, incl. the reference golden vectors.  Skipped when the shared
library hasn't been built (native/build.sh)."""

import random

import pytest

from bn254_tpu import native as N
from bn254_tpu.spec import field as SF
from bn254_tpu.spec import group as SG
from bn254_tpu.spec.constants import Q, R
import golden

pytestmark = pytest.mark.skipif(not N.available(),
                                reason="native library not built")

SEED = 0xC0DE


def _g1(k):
    return SG.scalar_mul((SG.G1_PARAMS[1][0], SG.G1_PARAMS[1][1],
                          SG.G1_PARAMS[0].one), k, SG.G1_PARAMS[0])


def _g2(k):
    return SG.scalar_mul((SG.G2_PARAMS[1][0], SG.G2_PARAMS[1][1],
                          SG.G2_PARAMS[0].one), k, SG.G2_PARAMS[0])


def test_scalar_mul_parity():
    """bn254_g1_mul / bn254_g2_mul are the C GLV + width-4 wNAF fast
    path (2.6x the double-and-add oracle on this host class); same
    group element as the mod.rs:272-292 oracle, projective compare.
    Edge scalars pin the decomposition corners (0, 1, r-1, r/2)."""
    rng = random.Random(SEED)
    g1 = (SG.G1_PARAMS[1][0], SG.G1_PARAMS[1][1], SG.G1_PARAMS[0].one)
    g2 = (SG.G2_PARAMS[1][0], SG.G2_PARAMS[1][1], SG.G2_PARAMS[0].one)
    ks = ([0, 1, 2, 3, R - 1, R - 2, (R - 1) // 2]
          + [rng.randrange(R) for _ in range(24)])
    for k in ks:
        assert SG.eq(N.g1_scalar_mul(g1, k),
                     SG.scalar_mul(g1, k, SG.G1_PARAMS[0]), SG.G1_PARAMS[0])
        assert SG.eq(N.g2_scalar_mul(g2, k),
                     SG.scalar_mul(g2, k, SG.G2_PARAMS[0]), SG.G2_PARAMS[0])
    # random non-generator bases
    for _ in range(6):
        p = _g1(rng.randrange(1, R))
        q = _g2(rng.randrange(1, R))
        k = rng.randrange(R)
        assert SG.eq(N.g1_scalar_mul(p, k),
                     SG.scalar_mul(p, k, SG.G1_PARAMS[0]), SG.G1_PARAMS[0])
        assert SG.eq(N.g2_scalar_mul(q, k),
                     SG.scalar_mul(q, k, SG.G2_PARAMS[0]), SG.G2_PARAMS[0])


def test_add_parity_incl_branches():
    rng = random.Random(SEED + 1)
    ops = SG.G1_PARAMS[0]
    p = _g1(rng.randrange(1, R))
    q = _g1(rng.randrange(1, R))
    cases = [(p, q), (p, p), (p, SG.neg(p, ops)), (p, SG.zero(ops)),
             (SG.zero(ops), q), (SG.zero(ops), SG.zero(ops))]
    for a, b in cases:
        assert SG.eq(N.g1_add(a, b), SG.add(a, b, ops), ops)


def test_reduced_pairing_golden():
    p = _g1(golden.MILLER_G1_SCALAR)
    q = _g2(golden.MILLER_G2_SCALAR)
    assert N.pairing(p, q) == golden.REDUCED_PAIRING_EXPECTED


def test_miller_loop_golden():
    p = _g1(golden.MILLER_G1_SCALAR)
    q = _g2(golden.MILLER_G2_SCALAR)
    assert N.miller_loop_batch([q], [p]) == golden.MILLER_EXPECTED


def test_pairing_batch_parity():
    rng = random.Random(SEED + 2)
    ps = [_g1(rng.randrange(1, R)) for _ in range(4)]
    qs = [_g2(rng.randrange(1, R)) for _ in range(4)]
    ps[1] = SG.zero(SG.G1_PARAMS[0])      # silent skip
    qs[2] = SG.zero(SG.G2_PARAMS[0])
    assert N.pairing_batch(ps, qs) == SG.pairing_batch(ps, qs)
    # empty + all-infinity
    assert N.pairing_batch([], []) == SF.FQ12_ONE
    assert N.pairing_batch([SG.zero(SG.G1_PARAMS[0])],
                           [qs[0]]) == SF.FQ12_ONE


def test_miller_infinity_raises():
    with pytest.raises(ValueError):
        N.miller_loop_batch([SG.zero(SG.G2_PARAMS[0])], [_g1(3)])


def test_fq12_pow_and_final_exp_parity():
    rng = random.Random(SEED + 3)
    f = SG.pairing(_g1(5), _g2(7))
    e = rng.randrange(R)
    assert N.fq12_pow(f, e) == SF.fq12_pow(f, e)
    m = SG.miller_loop(SG.precompute(SG.to_affine(_g2(9), SG.Fq2Ops)),
                       SG.to_affine(_g1(11), SG.FqOps))
    assert N.final_exp(m) == SF.fq12_final_exponentiation(m)


def test_bilinearity_native():
    rng = random.Random(SEED + 4)
    a, b, s = (rng.randrange(1, R) for _ in range(3))
    e1 = N.pairing(_g1(a * s % R), _g2(b))
    e2 = N.pairing(_g1(a), _g2(b * s % R))
    assert e1 == e2 != SF.FQ12_ONE


def test_native_msm_g1_vs_spec():
    """C Pippenger MSM (the at-scale oracle for the device MSM) against
    the spec engine, with zero scalar + infinity point mixed in."""
    import random

    from bn254_tpu import native as NV
    from bn254_tpu.spec import group as SG
    from bn254_tpu.spec.constants import R

    rng = random.Random(0x517)
    ops, gen = SG.G1_PARAMS[0], SG.G1_PARAMS[1]
    n = 200
    ks = [rng.randrange(R) for _ in range(n - 3)] + [0, 1, R - 1]
    pts = [SG.scalar_mul((gen[0], gen[1], ops.one),
                         rng.randrange(1, 1 << 50), ops) for _ in range(n)]
    pts[5] = SG.zero(ops)
    want = SG.zero(ops)
    for p, k in zip(pts, ks):
        want = SG.add(want, SG.scalar_mul(p, k, ops), ops)
    assert SG.eq(NV.msm_g1(pts, ks), want, ops)


def test_native_msm_g2_vs_spec():
    import random

    from bn254_tpu import native as NV
    from bn254_tpu.spec import group as SG
    from bn254_tpu.spec.constants import R

    rng = random.Random(0x527)
    ops, gen = SG.G2_PARAMS[0], SG.G2_PARAMS[1]
    n = 48
    ks = [rng.randrange(R) for _ in range(n - 2)] + [0, 1]
    pts = [SG.scalar_mul((gen[0], gen[1], ops.one),
                         rng.randrange(1, 1 << 40), ops) for _ in range(n)]
    pts[3] = SG.zero(ops)
    want = SG.zero(ops)
    for p, k in zip(pts, ks):
        want = SG.add(want, SG.scalar_mul(p, k, ops), ops)
    assert SG.eq(NV.msm_g2(pts, ks), want, ops)
