"""Device G1/G2 group law vs the spec oracle (reference group_trials,
src/groups/tests.rs:85-106, on the batched branchless JAX path)."""

import random

import jax
import numpy as np
import pytest

from bn254_tpu import groups as G
from bn254_tpu import limbs as L
from bn254_tpu.spec import group as SG
from bn254_tpu.spec.constants import Q, R

SEED = 0x6E0


def _spec_params(K):
    return (SG.G1_PARAMS if K is G.G1 else SG.G2_PARAMS)


def _rand_points(K, rng, n):
    """Random spec points generator*k, plus identity and generator edges."""
    ops, gen, _b, _chk = _spec_params(K)
    g = (gen[0], gen[1], ops.one)
    pts = [SG.scalar_mul(g, rng.randrange(1, R), ops) for _ in range(n)]
    pts[0] = SG.zero(ops)          # identity in the batch
    pts[1] = g
    return pts


@pytest.mark.parametrize("K", [G.G1, G.G2], ids=["g1", "g2"])
def test_add_double_neg_vs_spec(K):
    ops = _spec_params(K)[0]
    rng = random.Random(SEED)
    pv = _rand_points(K, rng, 8)
    qv = _rand_points(K, rng, 8)
    # exercise every select branch: P+inf, inf+Q, P+P, P+(-P), generic
    qv[2] = pv[2]                     # equal points -> double
    qv[3] = SG.neg(pv[3], ops)        # inverse points -> infinity
    qv[4] = SG.zero(ops)              # q at infinity
    p = G.encode_points(K, pv)
    q = G.encode_points(K, qv)

    added, dbl, negd, eqs = (G.add(K, p, q), G.double(K, p), G.neg(K, p),
                             G.eq_points(K, p, q))
    for got, a, b in zip(G.decode_points(K, added), pv, qv):
        assert SG.eq(got, SG.add(a, b, ops), ops)
    for got, a in zip(G.decode_points(K, dbl), pv):
        assert SG.eq(got, SG.double(a, ops), ops)
    for got, a in zip(G.decode_points(K, negd), pv):
        assert SG.eq(got, SG.neg(a, ops), ops)
    for got, a, b in zip(np.asarray(eqs), pv, qv):
        assert bool(got) == SG.eq(a, b, ops)


@pytest.mark.parametrize("K", [G.G1, G.G2], ids=["g1", "g2"])
def test_scalar_mul_vs_spec(K):
    ops = _spec_params(K)[0]
    rng = random.Random(SEED + 1)
    pv = _rand_points(K, rng, 4)
    ks = [rng.randrange(R) for _ in range(4)]
    ks[0] = 0
    ks[1] = 1
    p = G.encode_points(K, pv)
    k = jax.numpy.asarray(L.stack_ints(ks))

    out = jax.jit(lambda p, k: G.scalar_mul(K, p, k))(p, k)
    for got, a, s in zip(G.decode_points(K, out), pv, ks):
        assert SG.eq(got, SG.scalar_mul(a, s, ops), ops)


@pytest.mark.parametrize("K", [G.G1, G.G2], ids=["g1", "g2"])
def test_to_affine_and_checks(K):
    ops, gen, b, _ = _spec_params(K)
    rng = random.Random(SEED + 2)
    pv = _rand_points(K, rng, 5)

    p = G.encode_points(K, pv)

    xy, inf = jax.jit(lambda p: G.to_affine(K, p))(p)
    oc = G.on_curve(K, xy)
    inf = np.asarray(inf)
    oc = np.asarray(oc)
    xs = K.decode(xy[0])
    ys = K.decode(xy[1])
    for i, a in enumerate(pv):
        want = SG.to_affine(a, ops)
        if want is None:
            assert inf[i]
        else:
            assert not inf[i]
            assert (xs[i], ys[i]) == want
            assert oc[i]


def test_group_trials_laws():
    """Identities/associativity/DH consistency (groups/tests.rs:85-106) on
    a single jitted program."""
    K = G.G1
    ops = _spec_params(K)[0]
    rng = random.Random(SEED + 3)
    pv = _rand_points(K, rng, 6)
    qv = _rand_points(K, rng, 6)
    rv = _rand_points(K, rng, 6)
    p, q, r = (G.encode_points(K, v) for v in (pv, qv, rv))

    b = p[0].shape[1]
    zero = G.zero_point(K, b)
    lhs = G.add(K, G.add(K, p, q), r)
    rhs = G.add(K, p, G.add(K, q, r))
    assoc = G.eq_points(K, lhs, rhs)
    idl = G.eq_points(K, G.add(K, p, zero), p)
    inv = G.is_zero_point(K, G.add(K, p, G.neg(K, p)))
    assert np.asarray(assoc).all()
    assert np.asarray(idl).all()
    assert np.asarray(inv).all()


def test_g2_subgroup_check():
    """G2 decode order check (mod.rs:104-107, :469): generator passes; a
    curve point outside the r-subgroup fails."""
    rng = random.Random(SEED + 4)
    ops, gen, b2, _ = SG.G2_PARAMS
    good = [SG.to_affine(SG.scalar_mul((gen[0], gen[1], ops.one),
                                       rng.randrange(1, R), ops), ops)
            for _ in range(2)]
    # cofactor h2 = (q-1) + order-ish: find a curve point NOT in the
    # subgroup by sampling x until y^2 = x^3 + b2 has a root, then checking
    # the spec says it's out of order.
    from bn254_tpu.spec import field as SF
    bad = None
    x = (5, 0)
    while bad is None:
        rhs = SF.fq2_add(SF.fq2_mul(SF.fq2_sqr(x), x), b2)
        y = SF.fq2_sqrt(rhs)
        if y is not None and not SG.in_subgroup(x, y, ops):
            bad = (x, y)
        x = (x[0] + 1, x[1])
    pts = good + [bad]
    xy = (G.G2.encode([p[0] for p in pts]), G.G2.encode([p[1] for p in pts]))
    ok = np.asarray(jax.jit(lambda xy: G.in_subgroup(G.G2, xy))(xy))
    assert ok[0] and ok[1] and not ok[2]


@pytest.mark.parametrize("K", [G.G1, G.G2], ids=["g1", "g2"])
def test_scramble_invert_10_rounds_device(K):
    """Reference-scale scramble-and-invert (groups/tests.rs:42-83: 10
    forward rounds of *a, neg, +b, *c, neg, -d, double, then the exact
    inverse sequence) on the BATCHED device group law — 8 independent
    lanes (incl. identity and generator starts) stand in for the
    reference's 50 serial trials; every op is the memo-jitted branchless
    device path, not the spec engine."""
    import jax.numpy as jnp

    ops = _spec_params(K)[0]
    rng = random.Random(SEED + 7)
    B = 8
    begin_s = _rand_points(K, rng, B)   # lane 0 identity, lane 1 generator
    b_s = _rand_points(K, rng, B)
    d_s = _rand_points(K, rng, B)
    a_i = [rng.randrange(1, R) for _ in range(B)]
    c_i = [rng.randrange(1, R) for _ in range(B)]

    begin = G.encode_points(K, begin_s)
    b = G.encode_points(K, b_s)
    d = G.encode_points(K, d_s)
    a = jnp.asarray(L.stack_ints(a_i))
    c = jnp.asarray(L.stack_ints(c_i))
    ai = jnp.asarray(L.stack_ints([pow(x, R - 2, R) for x in a_i]))
    ci = jnp.asarray(L.stack_ints([pow(x, R - 2, R) for x in c_i]))
    ti = jnp.asarray(L.stack_ints([pow(2, R - 2, R)] * B))

    acc = begin
    for _ in range(10):
        acc = G.scalar_mul(K, acc, a)
        acc = G.neg(K, acc)
        acc = G.add(K, acc, b)
        acc = G.scalar_mul(K, acc, c)
        acc = G.neg(K, acc)
        acc = G.add(K, acc, G.neg(K, d))
        acc = G.double(K, acc)
    for _ in range(10):
        acc = G.scalar_mul(K, acc, ti)
        acc = G.add(K, acc, d)
        acc = G.neg(K, acc)
        acc = G.scalar_mul(K, acc, ci)
        acc = G.add(K, acc, G.neg(K, b))
        acc = G.neg(K, acc)
        acc = G.scalar_mul(K, acc, ai)
    assert bool(np.asarray(G.eq_points(K, acc, begin)).all())
