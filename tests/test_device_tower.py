"""Device Fq2/Fq6/Fq12 vs the spec oracle + the reference's Fq12 golden
vectors (fields/mod.rs:94-344) on the batched JAX path."""

import random

import jax
import numpy as np

from bn254_tpu import tower as T
from bn254_tpu.spec import field as SF
from bn254_tpu.spec.constants import Q
import golden

SEED = 0x70E5
B = 5


def _rand_fq2(rng):
    return (rng.randrange(Q), rng.randrange(Q))


def _rand_fq6(rng):
    return tuple(_rand_fq2(rng) for _ in range(3))


def _rand_fq12(rng):
    return (_rand_fq6(rng), _rand_fq6(rng))


def test_fq2_ops_vs_spec():
    rng = random.Random(SEED)
    av = [_rand_fq2(rng) for _ in range(B)] + [(0, 0), (1, 0), (0, 1)]
    bv = [_rand_fq2(rng) for _ in range(B)] + [(Q - 1, Q - 1), (0, 0), (5, 7)]
    a, b = T.fq2_encode(av), T.fq2_encode(bv)

    add, sub, mul, sqr, neg, inv, xi, conj = (
        T.fq2_add(a, b), T.fq2_sub(a, b), T.fq2_mul(a, b),
        T.fq2_sqr(a), T.fq2_neg(a), jax.jit(T.fq2_inv)(a),
        T.fq2_mul_by_xi(a), T.fq2_conj(a))
    assert T.fq2_decode(add) == [SF.fq2_add(x, y) for x, y in zip(av, bv)]
    assert T.fq2_decode(sub) == [SF.fq2_sub(x, y) for x, y in zip(av, bv)]
    assert T.fq2_decode(mul) == [SF.fq2_mul(x, y) for x, y in zip(av, bv)]
    assert T.fq2_decode(sqr) == [SF.fq2_sqr(x) for x in av]
    assert T.fq2_decode(neg) == [SF.fq2_neg(x) for x in av]
    assert T.fq2_decode(xi) == [SF.fq2_mul_by_nonresidue(x) for x in av]
    assert T.fq2_decode(conj) == [SF.fq2_frob(x, 1) for x in av]
    for x, got in zip(av, T.fq2_decode(inv)):
        want = SF.fq2_inv(x)
        assert got == (want if want is not None else (0, 0))


def test_fq6_ops_vs_spec():
    rng = random.Random(SEED + 1)
    av = [_rand_fq6(rng) for _ in range(B)]
    bv = [_rand_fq6(rng) for _ in range(B)]
    a, b = T.fq6_encode(av), T.fq6_encode(bv)

    mul, sqr, inv, nr, f1, f2, f3 = (
        T.fq6_mul(a, b), T.fq6_sqr(a), jax.jit(T.fq6_inv)(a),
        T.fq6_mul_by_nonresidue(a),
        T.fq6_frob(a, 1), T.fq6_frob(a, 2), T.fq6_frob(a, 3))
    assert T.fq6_decode(mul) == [SF.fq6_mul(x, y) for x, y in zip(av, bv)]
    assert T.fq6_decode(sqr) == [SF.fq6_sqr(x) for x in av]
    assert T.fq6_decode(inv) == [SF.fq6_inv(x) for x in av]
    assert T.fq6_decode(nr) == [SF.fq6_mul_by_nonresidue(x) for x in av]
    assert T.fq6_decode(f1) == [SF.fq6_frob(x, 1) for x in av]
    assert T.fq6_decode(f2) == [SF.fq6_frob(x, 2) for x in av]
    assert T.fq6_decode(f3) == [SF.fq6_frob(x, 3) for x in av]


def test_fq12_ops_vs_spec():
    rng = random.Random(SEED + 2)
    av = [_rand_fq12(rng) for _ in range(B)]
    bv = [_rand_fq12(rng) for _ in range(B)]
    a, b = T.fq12_encode(av), T.fq12_encode(bv)

    mul, sqr, inv, conj, f1, f2, f3, cyc = (
        T.fq12_mul(a, b), T.fq12_sqr(a), jax.jit(T.fq12_inv)(a),
        T.fq12_conj(a), T.fq12_frob(a, 1), T.fq12_frob(a, 2),
        T.fq12_frob(a, 3), T.fq12_cyclotomic_sqr(a))
    assert T.fq12_decode(mul) == [SF.fq12_mul(x, y) for x, y in zip(av, bv)]
    assert T.fq12_decode(sqr) == [SF.fq12_sqr(x) for x in av]
    assert T.fq12_decode(inv) == [SF.fq12_inv(x) for x in av]
    assert T.fq12_decode(conj) == [SF.fq12_conj(x) for x in av]
    assert T.fq12_decode(f1) == [SF.fq12_frob(x, 1) for x in av]
    assert T.fq12_decode(f2) == [SF.fq12_frob(x, 2) for x in av]
    assert T.fq12_decode(f3) == [SF.fq12_frob(x, 3) for x in av]
    assert T.fq12_decode(cyc) == [SF.fq12_cyclotomic_sqr(x) for x in av]


def test_fq12_mul_by_024_vs_spec():
    rng = random.Random(SEED + 3)
    av = [_rand_fq12(rng) for _ in range(B)]
    e0 = [_rand_fq2(rng) for _ in range(B)]
    evv = [_rand_fq2(rng) for _ in range(B)]
    evw = [_rand_fq2(rng) for _ in range(B)]

    out = T.fq12_mul_by_024(
        T.fq12_encode(av), T.fq2_encode(e0), T.fq2_encode(evv),
        T.fq2_encode(evw))
    want = [SF.fq12_mul_by_024(x, a, w, v)
            for x, a, v, w in zip(av, e0, evv, evw)]
    assert T.fq12_decode(out) == want


def test_fq12_golden_vector():
    """fields/mod.rs:94-227 on device: 100 muls + 10 sqr + scramble."""
    start = T.fq12_encode([golden.FQ12_VECTOR_START])

    def run(start):
        nxt = start
        def mul_body(nxt, _):
            return T.fq12_mul(nxt, start), None
        nxt, _ = jax.lax.scan(mul_body, nxt, None, length=100)
        cpy = nxt
        def sqr_body(nxt, _):
            return T.fq12_sqr(nxt), None
        nxt, _ = jax.lax.scan(sqr_body, nxt, None, length=10)
        def scr_body(nxt, _):
            return T.fq12_neg(T.fq12_sub(T.fq12_add(nxt, start), cpy)), None
        nxt, _ = jax.lax.scan(scr_body, nxt, None, length=10)
        return T.fq12_sqr(nxt)

    assert T.fq12_decode(jax.jit(run)(start))[0] == golden.FQ12_VECTOR_EXPECTED


def test_cyclotomic_exp_golden():
    """fields/mod.rs:229-344 on device."""
    orig = T.fq12_encode([golden.CYCLOTOMIC_EXP_ORIG])
    out = jax.jit(T.fq12_exp_by_neg_z)(orig)
    assert T.fq12_decode(out)[0] == golden.CYCLOTOMIC_EXP_EXPECTED


def test_final_exponentiation_vs_spec():
    rng = random.Random(SEED + 4)
    av = [_rand_fq12(rng) for _ in range(3)]
    out = jax.jit(T.fq12_final_exponentiation)(T.fq12_encode(av))
    assert T.fq12_decode(out) == [SF.fq12_final_exponentiation(x) for x in av]


def test_fq2_sqrt_vs_spec():
    """fq2.rs:208-224 incl. the zcash vector (fq2.rs:235-260)."""
    rng = random.Random(SEED + 5)
    sq = [_rand_fq2(rng) for _ in range(6)]
    vals = [SF.fq2_sqr(s) for s in sq]
    vals += [golden.SQRT_FQ2_ARG, SF.fq2_neg(SF.FQ2_ONE), (1, 2)]
    root, ok = jax.jit(T.fq2_sqrt)(T.fq2_encode(vals))
    root = T.fq2_decode(root)
    ok = np.asarray(ok)
    for v, r, m in zip(vals, root, ok):
        want = SF.fq2_sqrt(v)
        assert m == (want is not None)
        if m:
            assert r == want
