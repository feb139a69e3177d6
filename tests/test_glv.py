"""GLV scalar-mul vs the double-and-add oracle (mod.rs:272-292 parity).

The oracle is groups.scalar_mul (bit-exact vs the reference); GLV must
produce the SAME group element (projective equality / affine match).
"""

import random

import numpy as np
import jax.numpy as jnp

from bn254_tpu import glv
from bn254_tpu import groups as G
from bn254_tpu import limbs as L
from bn254_tpu.spec.constants import Q, R


def test_glv_constants():
    lam = glv.LAMBDA
    assert (lam * lam + lam + 1) % R == 0
    assert pow(glv.BETA_G1, 3, Q) == 1 and glv.BETA_G1 != 1
    assert pow(glv.BETA_G2, 3, Q) == 1 and glv.BETA_G2 != 1
    assert glv.BETA_G1 != glv.BETA_G2


def test_decompose_identity_and_bounds():
    rng = random.Random(0x61)
    ks = [rng.randrange(R) for _ in range(62)] + [0, 1, R - 1, R // 2]
    k = jnp.asarray(L.stack_ints(ks))
    a1, s1, a2, s2 = glv.decompose(k)
    a1 = np.asarray(a1)
    a2 = np.asarray(a2)
    s1 = np.asarray(s1)
    s2 = np.asarray(s2)
    for i, kv in enumerate(ks):
        k1 = L.int_from_limbs(a1[:, i]) * (-1 if s1[i] else 1)
        k2 = L.int_from_limbs(a2[:, i]) * (-1 if s2[i] else 1)
        assert (k1 + k2 * glv.LAMBDA) % R == kv, i
        assert abs(k1) < 1 << glv.NUM_BITS and abs(k2) < 1 << glv.NUM_BITS


def _check_group(K, n=8):
    rng = random.Random(7 + (K is G.G2))
    ks = [rng.randrange(R) for _ in range(n - 4)] + [0, 1, 2, R - 1]
    k = jnp.asarray(L.stack_ints(ks))
    base = G.generator(K, n)
    want = G.scalar_mul(K, base, k)
    got = glv.scalar_mul_glv(K, base, k)
    assert bool(np.asarray(G.eq_points(K, want, got)).all())


def test_glv_matches_oracle_g1():
    _check_group(G.G1)


def test_glv_matches_oracle_g2():
    _check_group(G.G2)


def test_decompose_bounds_at_scale():
    """20,000 random scalars + adversarial edges through the batched
    decomposition in one device call: identity k = k1 + k2*lambda (mod R)
    and |ki| < 2^NUM_BITS for every lane (the Barrett rounding slack is
    what the 128-step ladder depth relies on)."""
    rng = random.Random(0xD15C)
    n = 20000
    ks = [rng.randrange(R) for _ in range(n - 6)] + [
        0, 1, R - 1, R // 2, glv.LAMBDA, R - glv.LAMBDA]
    k = jnp.asarray(L.stack_ints(ks))
    a1, s1, a2, s2 = glv.decompose(k)
    a1 = np.asarray(a1); a2 = np.asarray(a2)
    s1 = np.asarray(s1); s2 = np.asarray(s2)
    top = L.N_LIMBS * L.LIMB_BITS
    for i, kv in enumerate(ks):
        k1 = L.int_from_limbs(a1[:, i]) * (-1 if s1[i] else 1)
        k2 = L.int_from_limbs(a2[:, i]) * (-1 if s2[i] else 1)
        assert (k1 + k2 * glv.LAMBDA) % R == kv, i
        assert abs(k1) < 1 << glv.NUM_BITS and abs(k2) < 1 << glv.NUM_BITS, i
