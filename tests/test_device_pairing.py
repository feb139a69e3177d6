"""Device optimal-ate pairing vs the reference's golden vectors and the
spec oracle (groups/mod.rs:642-691, :779-892, :928-999, :1034-1124)."""

import random

import jax
import numpy as np

from bn254_tpu import groups as G
from bn254_tpu import pairing_jax as P
from bn254_tpu import tower as T
from bn254_tpu.spec import field as SF
from bn254_tpu.spec import group as SG
from bn254_tpu.spec.constants import R
import golden

SEED = 0xA7E


def _g1(k):
    return SG.scalar_mul((SG.G1_PARAMS[1][0], SG.G1_PARAMS[1][1],
                          SG.G1_PARAMS[0].one), k, SG.G1_PARAMS[0])


def _g2(k):
    return SG.scalar_mul((SG.G2_PARAMS[1][0], SG.G2_PARAMS[1][1],
                          SG.G2_PARAMS[0].one), k, SG.G2_PARAMS[0])


def test_prepared_g2_golden():
    """All 87 line coefficients for the golden G2 point (mod.rs:779-892):
    count, first and last triples; full parity vs the spec precompute."""
    qa = golden.PREPARED_G2_Q
    xy = (G.G2.encode([qa[0]]), G.G2.encode([qa[1]]))
    coeffs = jax.jit(P.precompute)(xy)

    # decode: leaf arrays are [87, N_LIMBS, 1]
    def decode_triple(i):
        out = []
        for c in coeffs:  # ell_0, ell_vw, ell_vv
            out.append(T.fq2_decode((c[0][i], c[1][i]))[0])
        return tuple(out)

    n = coeffs[0][0].shape[0]
    assert n == golden.PREPARED_G2_COEFF_COUNT == 87
    assert decode_triple(0) == golden.PREPARED_G2_COEFF_FIRST
    assert decode_triple(86) == golden.PREPARED_G2_COEFF_LAST
    spec_coeffs = SG.precompute(qa)
    got = [decode_triple(i) for i in range(87)]
    assert got == spec_coeffs


def test_miller_loop_golden():
    """Un-exponentiated Miller loop exact Fq12 (mod.rs:642-691)."""
    p = _g1(golden.MILLER_G1_SCALAR)
    q = _g2(golden.MILLER_G2_SCALAR)
    pd = G.encode_points(G.G1, [p])
    qd = G.encode_points(G.G2, [q])
    f = jax.jit(P.miller_loop_batch)(qd, pd)
    assert T.fq12_decode(f)[0] == golden.MILLER_EXPECTED


def test_reduced_pairing_golden():
    """Full reduced pairing exact Fq12 (mod.rs:928-999)."""
    p = _g1(golden.MILLER_G1_SCALAR)
    q = _g2(golden.MILLER_G2_SCALAR)
    out = jax.jit(P.pairing_batch)(G.encode_points(G.G1, [p]),
                                   G.encode_points(G.G2, [q]))
    assert T.fq12_decode(out)[0] == golden.REDUCED_PAIRING_EXPECTED


def test_batch_pairing_vs_spec_with_infinity():
    """Batch semantics (mod.rs:904-926): product over pairs, silent skip of
    infinity pairs, one shared final exp — vs the spec oracle."""
    rng = random.Random(SEED)
    n = 5
    ps = [_g1(rng.randrange(1, R)) for _ in range(n)]
    qs = [_g2(rng.randrange(1, R)) for _ in range(n)]
    ps[2] = SG.zero(SG.G1_PARAMS[0])   # infinity pair -> skipped
    qs[3] = SG.zero(SG.G2_PARAMS[0])

    out = jax.jit(P.pairing_batch)(G.encode_points(G.G1, ps),
                                   G.encode_points(G.G2, qs))
    assert T.fq12_decode(out)[0] == SG.pairing_batch(ps, qs)


def test_all_infinity_batch_is_identity():
    """Empty effective batch -> GT identity (mod.rs:922-924, :1035-1040)."""
    ps = [SG.zero(SG.G1_PARAMS[0])] * 2
    qs = [_g2(5), SG.zero(SG.G2_PARAMS[0])]
    qs, ps = qs, ps  # pair 0: inf G1; pair 1: inf both
    out = jax.jit(P.pairing_batch)(G.encode_points(G.G1, ps),
                                   G.encode_points(G.G2, qs))
    assert T.fq12_decode(out)[0] == SF.FQ12_ONE


def test_bilinearity():
    """e(sP, Q) == e(P, sQ) == e(P, Q)^s and e != 1 (mod.rs:1094-1124),
    computed on device, exponent check via the spec."""
    rng = random.Random(SEED + 1)
    a, b = rng.randrange(1, R), rng.randrange(1, R)
    p, q = _g1(a), _g2(b)
    s = rng.randrange(1, R)
    sp, sq = _g1(a * s % R), _g2(b * s % R)

    pd = G.encode_points(G.G1, [sp, p])
    qd = G.encode_points(G.G2, [q, sq])
    out = jax.jit(P.pairing)(pd, qd)
    e1, e2 = T.fq12_decode(out)
    assert e1 == e2 != SF.FQ12_ONE
    base = SG.pairing(p, q)
    assert e1 == SF.fq12_pow(base, s)
