"""Group-law and pairing tests for the spec: ports of group_trials
(src/groups/tests.rs), the pairing golden vectors, bilinearity laws, and the
batch semantics (src/groups/mod.rs tests)."""

import random

import pytest

from bn254_tpu.spec import constants as C
from bn254_tpu.spec import field as F
from bn254_tpu.spec import group as G
import golden

G1GEN = (1, 2, 1)
G2GEN = (C.G2_ONE[0], C.G2_ONE[1], F.FQ2_ONE)
GROUPS = [(G.FqOps, G1GEN), (G.Fq2Ops, G2GEN)]
IDS = ["g1", "g2"]


def rand_point(K, gen, rng):
    return G.scalar_mul(gen, rng.getrandbits(512) % C.R, K)


@pytest.mark.parametrize("K,gen", GROUPS, ids=IDS)
def test_group_trials(K, gen):
    """Port of group_trials (groups/tests.rs:85-106)."""
    rng = random.Random(0xB254)
    zero = G.zero(K)

    assert G.is_zero(zero, K)
    assert G.is_zero(G.add(gen, G.neg(gen, K), K), K)
    assert G.eq(G.add(gen, gen, K), G.scalar_mul(gen, 2, K), K)
    assert G.is_zero(G.double(zero, K), K)
    # g * (-1) + g == 0
    assert G.is_zero(G.add(G.scalar_mul(gen, C.R - 1, K), gen, K), K)

    two_inv = pow(2, C.R - 2, C.R)

    for _ in range(8):
        r1, r2, r3 = (rand_point(K, gen, rng) for _ in range(3))
        # associativity (tests.rs:5-14)
        assert G.eq(G.add(G.add(r1, r2, K), r3, K),
                    G.add(r1, G.add(r2, r3, K), K), K)
        s = G.add(G.add(r1, r2, K), r3, K)
        s = G.add(s, G.neg(r2, K), K)
        s = G.add(s, G.neg(r3, K), K)
        s = G.add(s, G.neg(r1, K), K)
        assert G.is_zero(s, K)
        # doubling (tests.rs:16-25)
        assert G.eq(G.add(G.add(r1, r2, K), r1, K),
                    G.add(G.double(r1, K), r2, K), K)
        assert G.eq(r1, G.scalar_mul(G.double(r1, K), two_inv, K), K)
        # DH consistency (tests.rs:27-40)
        a_sk = rng.getrandbits(256) % C.R
        b_sk = rng.getrandbits(256) % C.R
        a_pk = G.scalar_mul(gen, a_sk, K)
        b_pk = G.scalar_mul(gen, b_sk, K)
        assert G.eq(G.scalar_mul(b_pk, a_sk, K),
                    G.scalar_mul(a_pk, b_sk, K), K)

    # 3-round scramble-and-invert (tests.rs:42-83)
    begin = rand_point(K, gen, rng)
    acc = begin
    a = rng.getrandbits(256) % C.R
    b = rand_point(K, gen, rng)
    c = rng.getrandbits(256) % C.R
    d = rand_point(K, gen, rng)
    for _ in range(3):
        acc = G.scalar_mul(acc, a, K)
        acc = G.neg(acc, K)
        acc = G.add(acc, b, K)
        acc = G.scalar_mul(acc, c, K)
        acc = G.neg(acc, K)
        acc = G.add(acc, G.neg(d, K), K)
        acc = G.double(acc, K)
    ai = pow(a, C.R - 2, C.R)
    ci = pow(c, C.R - 2, C.R)
    for _ in range(3):
        acc = G.scalar_mul(acc, two_inv, K)
        acc = G.add(acc, d, K)
        acc = G.neg(acc, K)
        acc = G.scalar_mul(acc, ci, K)
        acc = G.add(acc, G.neg(b, K), K)
        acc = G.neg(acc, K)
        acc = G.scalar_mul(acc, ai, K)
    assert G.eq(acc, begin, K)


@pytest.mark.parametrize("K,gen", GROUPS, ids=IDS)
def test_affine_jacobian_conversion(K, gen):
    """groups/mod.rs:492-513."""
    rng = random.Random(7)
    assert G.to_affine(G.zero(K), K) is None
    for _ in range(16):
        a = rand_point(K, gen, rng)
        aff = G.to_affine(a, K)
        back = (aff[0], aff[1], K.one)
        assert G.eq(a, back, K)


def test_y_at_infinity():
    """groups/mod.rs:1156-1163: zero is (0, 1, 0) and -zero keeps y == 1."""
    z1 = G.zero(G.FqOps)
    assert z1[1] == 1
    assert G.neg(z1, G.FqOps)[1] == 1
    z2 = G.zero(G.Fq2Ops)
    assert z2[1] == F.FQ2_ONE
    assert G.neg(z2, G.Fq2Ops)[1] == F.FQ2_ONE


def test_prepared_g2_golden():
    """groups/mod.rs:779-892: coefficient count and spot-checked coeffs."""
    q = G.to_affine(G.scalar_mul(G2GEN, golden.MILLER_G2_SCALAR, G.Fq2Ops),
                    G.Fq2Ops)
    assert q == golden.PREPARED_G2_Q
    coeffs = G.precompute(q)
    assert len(coeffs) == golden.PREPARED_G2_COEFF_COUNT
    assert coeffs[0] == golden.PREPARED_G2_COEFF_FIRST
    assert coeffs[-1] == golden.PREPARED_G2_COEFF_LAST


def test_miller_loop_golden():
    """groups/mod.rs:642-691."""
    g1 = G.scalar_mul(G1GEN, golden.MILLER_G1_SCALAR, G.FqOps)
    g2 = G.scalar_mul(G2GEN, golden.MILLER_G2_SCALAR, G.Fq2Ops)
    pa = G.to_affine(g1, G.FqOps)
    coeffs = G.precompute(G.to_affine(g2, G.Fq2Ops))
    assert G.miller_loop(coeffs, pa) == golden.MILLER_EXPECTED


def test_reduced_pairing_golden():
    """groups/mod.rs:928-999."""
    g1 = G.scalar_mul(G1GEN, golden.MILLER_G1_SCALAR, G.FqOps)
    g2 = G.scalar_mul(G2GEN, golden.MILLER_G2_SCALAR, G.Fq2Ops)
    assert G.pairing(g1, g2) == golden.REDUCED_PAIRING_EXPECTED


def test_bilinearity():
    """groups/mod.rs:1094-1124."""
    rng = random.Random(0xB111)
    for _ in range(3):
        s = rng.getrandbits(512) % C.R
        p = rand_point(G.FqOps, G1GEN, rng)
        q = rand_point(G.Fq2Ops, G2GEN, rng)
        sp = G.scalar_mul(p, s, G.FqOps)
        sq = G.scalar_mul(q, s, G.Fq2Ops)

        a = F.fq12_pow(G.pairing(p, q), s)
        b = G.pairing(sp, q)
        c = G.pairing(p, sq)
        assert a == b == c
        assert a != F.FQ12_ONE
        assert F.fq12_mul(F.fq12_pow(a, C.R - 1), a) == F.FQ12_ONE


def test_batch_semantics():
    """groups/mod.rs:1034-1092 (0/1/N pairs) + infinity skip (:904-926)."""
    rng = random.Random(0xBA7C)
    # empty -> identity
    assert G.pairing_batch([], []) == F.FQ12_ONE

    ps, qs, sps, sqs = [], [], [], []
    for _ in range(5):
        p = rand_point(G.FqOps, G1GEN, rng)
        q = rand_point(G.Fq2Ops, G2GEN, rng)
        s = rng.getrandbits(512) % C.R
        ps.append(p)
        qs.append(q)
        sps.append(G.scalar_mul(p, s, G.FqOps))
        sqs.append(G.scalar_mul(q, s, G.Fq2Ops))
    assert G.pairing_batch(sps, qs) == G.pairing_batch(ps, sqs)

    # batch == product of singles (shared-squaring identity)
    singles = F.FQ12_ONE
    for p, q in zip(ps, qs):
        singles = F.fq12_mul(singles,
                             G.miller_loop(G.precompute(G.to_affine(q, G.Fq2Ops)),
                                           G.to_affine(p, G.FqOps)))
    assert F.fq12_final_exponentiation(singles) == G.pairing_batch(ps, qs)

    # infinity pairs are silently skipped
    zero1, zero2 = G.zero(G.FqOps), G.zero(G.Fq2Ops)
    assert (G.pairing_batch(ps + [zero1], qs + [qs[0]]) ==
            G.pairing_batch(ps, qs))
    assert (G.pairing_batch(ps + [ps[0]], qs + [zero2]) ==
            G.pairing_batch(ps, qs))
    # all-infinity -> identity
    assert G.pairing_batch([zero1], [qs[0]]) == F.FQ12_ONE


def test_pairing_infinity():
    """pairing with a point at infinity yields the identity
    (groups/mod.rs:894-902)."""
    q = G2GEN
    assert G.pairing(G.zero(G.FqOps), q) == F.FQ12_ONE
    assert G.pairing(G1GEN, G.zero(G.Fq2Ops)) == F.FQ12_ONE


def test_on_curve_rejection():
    """groups/mod.rs:1138-1153."""
    from bn254_tpu.spec import codec
    from bn254_tpu.errors import NotOnCurve
    with pytest.raises(NotOnCurve):
        codec.affine_g1_new(1, 1)
    codec.affine_g1_new(1, 2)  # the generator is fine


def test_g2_subgroup_check():
    """A point on the twist but outside the r-order subgroup must be
    rejected (G2Params::check_order, groups/mod.rs:469)."""
    from bn254_tpu.spec import codec
    from bn254_tpu.errors import NotInSubgroup
    # Find a twist point with small cofactor structure: pick x with a valid
    # y; the full twist group has order r * cofactor with cofactor > 1, so a
    # random solution is (with overwhelming probability) outside the
    # subgroup.
    x = (1, 0)
    while True:
        y2 = F.fq2_add(F.fq2_mul(F.fq2_sqr(x), x), C.B2)
        y = F.fq2_sqrt(y2)
        if y is not None:
            break
        x = (x[0] + 1, 0)
    if G.in_subgroup(x, y, G.Fq2Ops):
        pytest.skip("sampled point happened to lie in the subgroup")
    with pytest.raises(NotInSubgroup):
        codec.affine_g2_new(x, y)


def test_joux_three_party():
    """examples/joux.rs as an executable acceptance test."""
    rng = random.Random(42)
    a, b, c = (rng.getrandbits(256) % C.R for _ in range(3))
    pk1 = {k: G.scalar_mul(G1GEN, s, G.FqOps) for k, s in zip("abc", (a, b, c))}
    pk2 = {k: G.scalar_mul(G2GEN, s, G.Fq2Ops) for k, s in zip("abc", (a, b, c))}
    ss_a = F.fq12_pow(G.pairing(pk1["b"], pk2["c"]), a)
    ss_b = F.fq12_pow(G.pairing(pk1["c"], pk2["a"]), b)
    ss_c = F.fq12_pow(G.pairing(pk1["a"], pk2["b"]), c)
    assert ss_a == ss_b == ss_c


def test_dh_three_party():
    """examples/dh.rs as an executable acceptance test."""
    rng = random.Random(43)
    a, b, c = (rng.getrandbits(256) % C.R for _ in range(3))
    pa = G.scalar_mul(G1GEN, a, G.FqOps)
    pb = G.scalar_mul(G1GEN, b, G.FqOps)
    pc = G.scalar_mul(G1GEN, c, G.FqOps)
    # round 1 + round 2
    sa = G.scalar_mul(G.scalar_mul(pb, c, G.FqOps), a, G.FqOps)
    sb = G.scalar_mul(G.scalar_mul(pc, a, G.FqOps), b, G.FqOps)
    sc = G.scalar_mul(G.scalar_mul(pa, b, G.FqOps), c, G.FqOps)
    assert G.eq(sa, sb, G.FqOps) and G.eq(sb, sc, G.FqOps)
