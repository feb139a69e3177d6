"""Field-layer tests for the pure-Python spec: ports of the reference's
field_trials (src/fields/tests.rs) plus the golden vectors."""

import random

import pytest

from bn254_tpu.spec import constants as C
from bn254_tpu.spec import field as F
import golden


# --- generic op tables over the spec, so one trial suite serves all types ---

class FqT:
    mod = C.Q
    zero, one = 0, 1
    add = staticmethod(lambda a, b: (a + b) % C.Q)
    sub = staticmethod(lambda a, b: (a - b) % C.Q)
    mul = staticmethod(lambda a, b: a * b % C.Q)
    neg = staticmethod(lambda a: -a % C.Q)
    sqr = staticmethod(lambda a: a * a % C.Q)
    inv = staticmethod(lambda a: F.fp_inv(a, C.Q))

    @staticmethod
    def random(rng):
        return rng.getrandbits(512) % C.Q


class FrT(FqT):
    mod = C.R
    add = staticmethod(lambda a, b: (a + b) % C.R)
    sub = staticmethod(lambda a, b: (a - b) % C.R)
    mul = staticmethod(lambda a, b: a * b % C.R)
    neg = staticmethod(lambda a: -a % C.R)
    sqr = staticmethod(lambda a: a * a % C.R)
    inv = staticmethod(lambda a: F.fp_inv(a, C.R))

    @staticmethod
    def random(rng):
        return rng.getrandbits(512) % C.R


class Fq2T:
    zero, one = F.FQ2_ZERO, F.FQ2_ONE
    add, sub, mul = F.fq2_add, F.fq2_sub, F.fq2_mul
    neg, sqr, inv = F.fq2_neg, F.fq2_sqr, F.fq2_inv

    @staticmethod
    def random(rng):
        return (FqT.random(rng), FqT.random(rng))


class Fq6T:
    zero, one = F.FQ6_ZERO, F.FQ6_ONE
    add, sub, mul = F.fq6_add, F.fq6_sub, F.fq6_mul
    neg, sqr, inv = F.fq6_neg, F.fq6_sqr, F.fq6_inv

    @staticmethod
    def random(rng):
        return tuple(Fq2T.random(rng) for _ in range(3))


class Fq12T:
    zero, one = F.FQ12_ZERO, F.FQ12_ONE
    add, sub, mul = F.fq12_add, F.fq12_sub, F.fq12_mul
    neg, sqr, inv = F.fq12_neg, F.fq12_sqr, F.fq12_inv

    @staticmethod
    def random(rng):
        return (Fq6T.random(rng), Fq6T.random(rng))


ALL_FIELDS = [FrT, FqT, Fq2T, Fq6T, Fq12T]
IDS = ["fr", "fq", "fq2", "fq6", "fq12"]


@pytest.mark.parametrize("K", ALL_FIELDS, ids=IDS)
def test_field_trials(K):
    """Port of field_trials (fields/tests.rs:110-130), with iteration counts
    scaled to keep wall time sane — the JAX path re-runs these sweeps too."""
    rng = random.Random(0xB254)

    # consecutive-element inversion sweep (tests.rs:4-21)
    a = K.one
    for _ in range(200):
        assert K.mul(a, K.inv(a)) == K.one
        a = K.add(a, K.one)
    a = K.neg(K.one)
    for _ in range(200):
        assert K.mul(a, K.inv(a)) == K.one
        a = K.sub(a, K.one)
    assert K.inv(K.zero) is None

    # identities
    assert K.neg(K.zero) == K.zero
    assert K.add(K.neg(K.one), K.one) == K.zero
    assert K.sub(K.zero, K.zero) == K.zero

    for _ in range(50):
        x, y, z, w = (K.random(rng) for _ in range(4))
        # squaring == self-multiplication (tests.rs:34-47)
        assert K.sqr(x) == K.mul(x, x)
        # negation round trip (tests.rs:49-55)
        assert K.add(x, K.neg(x)) == K.zero
        # associativity + distributivity (tests.rs:23-32, :97-108)
        assert K.mul(K.mul(x, y), z) == K.mul(x, K.mul(y, z))
        assert (K.mul(K.add(x, y), K.add(z, w)) ==
                K.add(K.add(K.mul(x, z), K.mul(y, z)),
                      K.add(K.mul(x, w), K.mul(y, w))))
        # random inverses (tests.rs:88-95)
        assert K.mul(K.inv(x), x) == K.one if x != K.zero else True
        assert K.mul(K.mul(x, y), K.inv(x)) == y if x != K.zero else True


def test_fq12_golden_vector():
    """fields/mod.rs:94-227 — 100 muls, 10 squarings, add/sub/neg scramble."""
    start = golden.FQ12_VECTOR_START
    nxt = start
    for _ in range(100):
        nxt = F.fq12_mul(nxt, start)
    cpy = nxt
    for _ in range(10):
        nxt = F.fq12_sqr(nxt)
    for _ in range(10):
        nxt = F.fq12_add(nxt, start)
        nxt = F.fq12_sub(nxt, cpy)
        nxt = F.fq12_neg(nxt)
    nxt = F.fq12_sqr(nxt)
    assert nxt == golden.FQ12_VECTOR_EXPECTED


def test_cyclotomic_exp_golden():
    """fields/mod.rs:229-344 — exp_by_neg_z golden vector."""
    assert F.fq12_exp_by_neg_z(golden.CYCLOTOMIC_EXP_ORIG) == \
        golden.CYCLOTOMIC_EXP_EXPECTED


def test_sqrt_fq():
    """fp.rs:289-296."""
    r = F.fq_sqrt(golden.SQRT_FQ_ARG)
    assert r == golden.SQRT_FQ_ROOT
    # non-residues return None; q-1 is a non-residue
    assert F.fq_sqrt(C.Q - 1) is None


def test_sqrt_fq2():
    """fq2.rs:235-260."""
    assert F.fq2_sqrt(golden.SQRT_FQ2_ARG) == golden.SQRT_FQ2_ROOT
    # i is sqrt(-1)
    assert F.fq2_sqrt(F.fq2_neg(F.FQ2_ONE)) == F.FQ2_I
    # (1 + 2i) has no sqrt
    assert F.fq2_sqrt((1, 2)) is None


def test_frobenius_tables_match_reference():
    """The computed Frobenius/twist tables must equal the reference's
    hard-coded Montgomery constants (fq6.rs:5-90, fq12.rs:6-48,
    groups/mod.rs:531-564).  Spot-check via known u64-limb constants."""
    Rinv = pow(1 << 256, C.Q - 2, C.Q)

    def canon(limbs64):
        v = 0
        for i, w in enumerate(limbs64):
            v |= w << (64 * i)
        return v * Rinv % C.Q

    # fq12 frobenius_coeffs_c1(1) (fq12.rs:9-22)
    assert C.FROB12_C1[1] == (
        canon([12653890742059813127, 14585784200204367754,
               1278438861261381767, 212598772761311868]),
        canon([11683091849979440498, 14992204589386555739,
               15866167890766973222, 1200023580730561873]))
    # fq6 frobenius_coeffs_c1(1) == twist_mul_by_q_x (fq6.rs:8-21)
    assert C.FROB6_C1[1] == C.TWIST_MUL_BY_Q_X == (
        canon([13075984984163199792, 3782902503040509012,
               8791150885551868305, 1825854335138010348]),
        canon([7963664994991228759, 12257807996192067905,
               13179524609921305146, 2767831111890561987]))
    # twist_mul_by_q_y (groups/mod.rs:549-564)
    assert C.TWIST_MUL_BY_Q_Y == (
        canon([16482010305593259561, 13488546290961988299,
               3578621962720924518, 2681173117283399901]),
        canon([11661927080404088775, 553939530661941723,
               7860678177968807019, 3208568454732775116]))
    # fq6 frobenius_coeffs_c2(1) (fq6.rs:51-64)
    assert C.FROB6_C2[1] == (
        canon([8314163329781907090, 11942187022798819835,
               11282677263046157209, 1576150870752482284]),
        canon([6763840483288992073, 7118829427391486816,
               4016233444936635065, 2630958277570195709]))


def test_from_str():
    """fields/mod.rs:68-81."""
    assert F.fr_from_str(
        "21888242871839275222246405745257275088548364400416034343698204186575808495616"
    ) == C.R - 1
    assert F.fq_from_str(
        "21888242871839275222246405745257275088696311157297823662689037894645226208582"
    ) == C.Q - 1
    assert F.fq_from_str("12x3") is None
    assert F.fq_from_str("") is None
