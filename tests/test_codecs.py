"""Codec and public-API tests: byte formats, compressed points, error
taxonomy (reference src/lib.rs tests + arith.rs divrem edge cases)."""

import random

import pytest

from bn254_tpu import (
    Fr, Fq, Fq2, G1, G2, AffineG1, AffineG2, Gt,
    pairing, pairing_batch, miller_loop_batch,
)
from bn254_tpu.errors import (
    InvalidSliceLength, NotMemberFieldError, InvalidEncoding,
    NotMemberCurveError, ToAffineConversion, NotOnCurve,
)
from bn254_tpu.spec import constants as C
from bn254_tpu.spec import codec
import golden


def test_g1_from_compressed():
    """lib.rs:681-688."""
    g1 = G1.from_compressed(bytes.fromhex(golden.G1_COMPRESSED_HEX))
    assert g1.x() == Fq(golden.G1_COMPRESSED_X)
    assert g1.y() == Fq(golden.G1_COMPRESSED_Y)
    assert g1.z() == Fq.one()
    # round trip
    enc = codec.g1_to_compressed((g1.x().v, g1.y().v))
    assert G1.from_compressed(enc) == g1
    # bad prefix
    bad = bytes([9]) + bytes.fromhex(golden.G1_COMPRESSED_HEX)[1:]
    with pytest.raises(InvalidEncoding):
        G1.from_compressed(bad)
    with pytest.raises(InvalidEncoding):
        G1.from_compressed(b"\x02\x00")


def test_g2_from_compressed():
    """lib.rs:691-736."""
    g2 = G2.from_compressed(bytes.fromhex(golden.G2_COMPRESSED_HEX))
    assert g2.x() == Fq2(Fq(golden.G2_COMPRESSED_X[0]), Fq(golden.G2_COMPRESSED_X[1]))
    assert g2.y() == Fq2(Fq(golden.G2_COMPRESSED_Y[0]), Fq(golden.G2_COMPRESSED_Y[1]))

    # 0b prefix is the reflected point
    g2r = -G2.from_compressed(bytes.fromhex(golden.G2_COMPRESSED_HEX_REFLECT))
    assert g2r.x() == g2.x()
    assert g2r.y() == g2.y()

    with pytest.raises(InvalidEncoding):
        G2.from_compressed(bytes.fromhex(golden.G2_COMPRESSED_HEX_BADPREFIX))

    # round trip
    enc = codec.g2_to_compressed((g2.x().c, g2.y().c))
    assert G2.from_compressed(enc) == g2


def test_fr_from_slice_unreduced():
    """Fr accepts unreduced 32B values (lib.rs:45-49)."""
    v = C.R + 12345
    a = Fr.from_slice(v.to_bytes(32, "big"))
    assert a == Fr(12345)
    with pytest.raises(InvalidSliceLength):
        Fr.from_slice(b"\x00" * 31)


def test_fr_set_bit_montgomery_repr():
    """Fr::set_bit operates on the raw MONTGOMERY representation
    (lib.rs:65-67, fp.rs:83-85) — pin the convention with independent
    int math against spec constants."""
    rinv = pow(C.MONT_R_FR, -1, C.R)
    rng = random.Random(0x5E7B17)
    for _ in range(20):
        v = rng.randrange(C.R)
        bit = rng.randrange(256)
        for to in (True, False):
            a = Fr(v)
            a.set_bit(bit, to)
            m = (v * C.MONT_R_FR) % C.R
            m = (m | (1 << bit)) if to else (m & ~(1 << bit))
            assert a == Fr((m * rinv) % C.R)
    # already-set / already-clear bits are no-ops
    a = Fr(12345)
    m = (12345 * C.MONT_R_FR) % C.R
    a.set_bit(0, bool(m & 1))
    assert a == Fr(12345)
    a.set_bit(300, True)                    # out-of-range: ignored
    assert a == Fr(12345)


def test_fq_from_slice_rejects_ge_q():
    """lib.rs:154-159."""
    assert Fq.from_slice((C.Q - 1).to_bytes(32, "big")) == Fq(C.Q - 1)
    with pytest.raises(NotMemberFieldError):
        Fq.from_slice(C.Q.to_bytes(32, "big"))


def test_to_big_endian_roundtrip():
    rng = random.Random(5)
    for _ in range(10):
        a = Fq.random(rng)
        assert Fq.from_slice(a.to_big_endian()) == a
        b = Fr.random(rng)
        assert Fr.from_slice(b.to_big_endian()) == b


def test_interpret():
    """64B hash-to-field style reduction (fp.rs:62, lib.rs:42-44)."""
    buf = bytes(range(64))
    v = int.from_bytes(buf, "big")
    assert Fq.interpret(buf) == Fq(v % C.Q)
    assert Fr.interpret(buf) == Fr(v % C.R)


def test_fq2_from_slice_divrem():
    """Fq2 64B decode as c1*q + c0 (lib.rs:260-267) + divrem edge cases
    (arith.rs:589-785)."""
    # c1*q + c0 round-trips
    rng = random.Random(6)
    for _ in range(10):
        c0, c1 = rng.randrange(C.Q), rng.randrange(C.Q)
        buf = (c1 * C.Q + c0).to_bytes(64, "big")
        a = Fq2.from_slice(buf)
        assert (a.real().v, a.imaginary().v) == (c0, c1)
    # q itself is 1*q + 0
    a = Fq2.from_slice(C.Q.to_bytes(64, "big"))
    assert (a.real().v, a.imaginary().v) == (0, 1)
    # q^2 - 1 = (q-1) q + (q-1)
    a = Fq2.from_slice((C.Q * C.Q - 1).to_bytes(64, "big"))
    assert (a.real().v, a.imaginary().v) == (C.Q - 1, C.Q - 1)
    # q^2 has quotient q -> rejected
    with pytest.raises(NotMemberFieldError):
        Fq2.from_slice((C.Q * C.Q).to_bytes(64, "big"))
    # all-ones is way above q^2 -> rejected
    with pytest.raises(NotMemberFieldError):
        Fq2.from_slice(b"\xff" * 64)


def test_affine_constructors():
    """lib.rs AffineG1/AffineG2 + on-curve rejection (mod.rs:1138-1145)."""
    with pytest.raises(NotOnCurve):
        AffineG1(Fq.one(), Fq.one())
    a = AffineG1(Fq(1), Fq(2))
    assert a.to_jacobian() == G1.one()
    assert AffineG1.from_jacobian(G1.zero()) is None
    b = AffineG2.from_jacobian(G2.one() * Fr(7))
    assert b.to_jacobian() == G2.one() * Fr(7)


def test_api_pairing_roundtrip():
    """Public API end-to-end: bilinearity + batch + miller_loop_batch."""
    rng = random.Random(11)
    s = Fr.random(rng)
    p = G1.random(rng)
    q = G2.random(rng)
    assert pairing(p * s, q) == pairing(p, q * s) == pairing(p, q).pow(s)

    pairs = [(p, q), (p * s, q)]
    assert pairing_batch(pairs) == pairing(p, q) * pairing(p * s, q)

    m = miller_loop_batch([(q, p)])
    assert m.final_exponentiation() == pairing(p, q)
    with pytest.raises(ToAffineConversion):
        miller_loop_batch([(G2.zero(), p)])


def test_gt_ops():
    p, q = G1.one(), G2.one()
    e = pairing(p, q)
    assert e.inverse() * e == Gt.one()
    assert e.pow(Fr(0)) == Gt.one()
    assert Gt.one().inverse() == Gt.one()


def test_predefined_pair():
    """groups/mod.rs:1001-1031."""
    g1 = AffineG1(
        Fq.from_str("1"), Fq.from_str("2")).to_jacobian()
    g2 = AffineG2(
        Fq2(Fq.from_str("10857046999023057135944570762232829481370756359578518086990519993285655852781"),
            Fq.from_str("11559732032986387107991004021392285783925812861821192530917403151452391805634")),
        Fq2(Fq.from_str("8495653923123431417604973247489272438418190587263600148770280649306958101930"),
            Fq.from_str("4082367875863433681332203403145435568316851327593401208105741076214120093531")),
    ).to_jacobian()
    p = pairing(g1, g2)
    p2 = pairing_batch([(g1, g2), (g1, g2)])
    assert not p.is_zero()
    assert not p2.is_zero()
    assert p2 == p * p
