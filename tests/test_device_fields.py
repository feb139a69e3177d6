"""Device Fq/Fr limb arithmetic vs the exact-int spec oracle.

Mirrors the reference's field_trials + Montgomery round-trip tests
(/root/reference/src/fields/tests.rs, fp.rs:267-296) on the batched JAX
path.
"""

import random

import numpy as np
import pytest

from bn254_tpu import limbs as L
from bn254_tpu.fields import FQ, FR
from bn254_tpu.spec.constants import Q, R

SEED = 0x5EED
B = 33  # deliberately non-aligned batch


def _rand_batch(rng, p, n=B, include_edges=True):
    vals = [rng.randrange(p) for _ in range(n)]
    if include_edges:
        vals[:4] = [0, 1, p - 1, p // 2]
    return vals


@pytest.mark.parametrize("F,p", [(FQ, Q), (FR, R)], ids=["fq", "fr"])
def test_codec_roundtrip(F, p):
    rng = random.Random(SEED)
    vals = _rand_batch(rng, p)
    assert F.decode(F.encode(vals)) == vals


@pytest.mark.parametrize("F,p", [(FQ, Q), (FR, R)], ids=["fq", "fr"])
def test_add_sub_neg_mul_sqr(F, p):
    rng = random.Random(SEED + 1)
    av = _rand_batch(rng, p)
    bv = _rand_batch(rng, p, include_edges=False)
    bv[:2] = [0, p - 1]
    a, b = F.encode(av), F.encode(bv)
    assert F.decode(F.add(a, b)) == [(x + y) % p for x, y in zip(av, bv)]
    assert F.decode(F.sub(a, b)) == [(x - y) % p for x, y in zip(av, bv)]
    assert F.decode(F.neg(a)) == [-x % p for x in av]
    assert F.decode(F.mul(a, b)) == [x * y % p for x, y in zip(av, bv)]
    assert F.decode(F.sqr(a)) == [x * x % p for x in av]


def test_mul_worst_case_carries():
    """p-1 squared etc. — the carry-chain stress values (arith.rs:589-785)."""
    vals = [Q - 1, Q - 2, 1, 2, (1 << 255) % Q, ((1 << 256) - 1) % Q]
    a = FQ.encode(vals)
    assert FQ.decode(FQ.mul(a, a)) == [v * v % Q for v in vals]


@pytest.mark.parametrize("F,p", [(FQ, Q), (FR, R)], ids=["fq", "fr"])
def test_inverse(F, p):
    rng = random.Random(SEED + 2)
    vals = _rand_batch(rng, p)
    inv = F.decode(F.inv(F.encode(vals)))
    for v, iv in zip(vals, inv):
        if v == 0:
            assert iv == 0  # branchless convention (spec returns None)
        else:
            assert v * iv % p == 1


def test_consecutive_inverse_sweep():
    """±128 consecutive elements around a random base — the reference's
    smoke test for rare-operand carry bugs (fields/tests.rs:4-21),
    device-sized."""
    rng = random.Random(SEED + 3)
    base = rng.randrange(Q)
    vals = [(base + i) % Q for i in range(128)]
    inv = FQ.decode(FQ.inv(FQ.encode(vals)))
    for v, iv in zip(vals, inv):
        assert (v * iv % Q == 1) if v else (iv == 0)


def test_pow_matches_python():
    rng = random.Random(SEED + 4)
    vals = _rand_batch(rng, Q)
    e = rng.getrandbits(256)
    out = FQ.decode(FQ.pow_const(FQ.encode(vals), e))
    assert out == [pow(v, e, Q) for v in vals]


def test_sqrt():
    rng = random.Random(SEED + 5)
    sq = [rng.randrange(Q) for _ in range(16)]
    vals = [v * v % Q for v in sq]            # guaranteed residues
    vals += [5, 7]                            # check mask on non-residues too
    root, ok = FQ.sqrt(FQ.encode(vals))
    root = FQ.decode(root)
    ok = np.asarray(ok)
    for v, r, m in zip(vals, root, ok):
        if m:
            assert r * r % Q == v
        else:
            assert pow(v, (Q - 1) // 2, Q) == Q - 1  # genuinely non-residue


def test_zcash_sqrt_vector():
    """sqrt golden vector from the reference (fp.rs:289-296, provenance:
    zcash test_proof.cpp): sqrt(348579348568) == 52040650627161603195962739
    03996315000119019512886596366359652578430118331601."""
    want = 5204065062716160319596273903996315000119019512886596366359652578430118331601
    root, ok = FQ.sqrt(FQ.encode([348579348568]))
    assert bool(np.asarray(ok)[0])
    assert FQ.decode(root)[0] == want


def test_pallas_mont_kernels_interpret_mode():
    """The fused Pallas Montgomery kernels agree with the jnp limb path
    (interpret mode on CPU; the real Mosaic path is exercised on TPU)."""
    import jax.numpy as jnp
    from bn254_tpu import pallas_kernels as PK

    rng = random.Random(SEED + 9)
    B2 = 128  # one grid tile
    av = [rng.randrange(Q) for _ in range(B2)]
    bv = [rng.randrange(Q) for _ in range(B2)]
    av[:2] = [0, Q - 1]
    bv[:2] = [Q - 1, Q - 1]
    a, b = jnp.asarray(FQ.encode(av)), jnp.asarray(FQ.encode(bv))
    got = FQ.decode(PK.mont_mul(a, b, FQ.mod, interpret=True))
    assert got == [x * y % Q for x, y in zip(av, bv)]
    got2 = FQ.decode(PK.mont_sqr(a, FQ.mod, interpret=True))
    assert got2 == [x * x % Q for x in av]
