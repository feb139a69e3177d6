"""Reference-scale verification sweeps (VERDICT r01 items 4-6).

The reference runs its randomized trials at full scale: a +/-10,000
consecutive-element inversion sweep (fields/tests.rs:4-21), 10,000 random
inverses (:88-95), a 50-pair batch pairing (groups/mod.rs:1034-1092), and
divrem edge vectors q^2, q^2 +/- 1, all-ones (arith.rs:589-785).  Round 1
scaled these down; here they run at the reference's sizes — the sweeps as
single batched device calls, the divrem extremes against the host codec's
decode paths.
"""

import random

import numpy as np
import jax
import jax.numpy as jnp

from bn254_tpu import tower as T
from bn254_tpu.fields import FQ, FR
from bn254_tpu.spec import codec as SC
from bn254_tpu.spec.constants import Q, R
from bn254_tpu.errors import NotMemberFieldError

import pytest


# ---------------------------------------------------------------------------
# Inversion sweeps (fields/tests.rs:4-21: a = 1, 2, ... and -1, -2, ...)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ctx,p", [(FQ, Q), (FR, R)], ids=["fq", "fr"])
def test_consecutive_inversion_sweep_device(ctx, p):
    """a * a^-1 == 1 for a in {1..10000} and {-1..-10000} — the rare-
    operand carry-chain smoke test (SURVEY 7 hard-part 1), one batched
    device call per direction."""
    n = 10000
    up = ctx.encode(range(1, n + 1))
    down = ctx.encode((p - k) % p for k in range(1, n + 1))
    a = jnp.concatenate([jnp.asarray(up), jnp.asarray(down)], axis=-1)
    fn = jax.jit(lambda a: ctx.eq(ctx.mul(a, ctx.inv(a)), ctx.ones(2 * n)))
    assert bool(np.asarray(fn(a)).all())


def test_zero_inverse_is_zero_mask():
    """F::zero().inverse() == None in the reference; branchless device
    path maps 0 -> 0 and callers mask via is_zero."""
    z = FQ.zeros(4)
    out = FQ.inv(z)
    assert bool(np.asarray(FQ.is_zero(out)).all())


def test_random_inverses_device():
    """10,000 random a: a^-1 * a == 1 and (a*b) * a^-1 == b
    (fields/tests.rs:88-95), two batched device calls."""
    rng = random.Random(0x1234)
    n = 10000
    av = [rng.randrange(1, Q) for _ in range(n)]
    bv = [rng.randrange(Q) for _ in range(n)]
    a = jnp.asarray(FQ.encode(av))
    b = jnp.asarray(FQ.encode(bv))

    def law(a, b):
        inv = FQ.inv(a)
        ok1 = FQ.eq(FQ.mul(inv, a), FQ.ones(n))
        ok2 = FQ.eq(FQ.mul(FQ.mul(a, b), inv), b)
        return ok1 & ok2

    assert bool(np.asarray(jax.jit(law)(a, b)).all())


def test_fq2_consecutive_inversion_sweep_device():
    """Fq2 inversion over consecutive elements a + i (2,000 each way —
    fq2_inv is 2 muls + 2 sqrs + 1 Fq inversion, same limb core)."""
    n = 2000
    c0 = [k % Q for k in range(1, n + 1)] + [(Q - k) % Q
                                            for k in range(1, n + 1)]
    c1 = [(3 * k + 1) % Q for k in range(2 * n)]
    a = (jnp.asarray(FQ.encode(c0)), jnp.asarray(FQ.encode(c1)))

    def law(a0, a1):
        inv = T.fq2_inv((a0, a1))
        prod = T.fq2_mul((a0, a1), inv)
        return T.fq2_eq(prod, T.fq2_ones(2 * n))

    assert bool(np.asarray(jax.jit(law)(a[0], a[1])).all())


# ---------------------------------------------------------------------------
# 50-pair batch pairing (groups/mod.rs:1034-1092 scale)
# ---------------------------------------------------------------------------

def test_batch_pairing_50_pairs_vs_spec():
    from bn254_tpu import groups as G
    from bn254_tpu import pairing_jax as PJ
    from bn254_tpu.spec import group as SG

    rng = random.Random(0xBA7C)
    ops1, gen1 = SG.G1_PARAMS[0], SG.G1_PARAMS[1]
    ops2, gen2 = SG.G2_PARAMS[0], SG.G2_PARAMS[1]
    ps = [SG.scalar_mul((gen1[0], gen1[1], ops1.one),
                        rng.randrange(1, R), ops1) for _ in range(50)]
    qs = [SG.scalar_mul((gen2[0], gen2[1], ops2.one),
                        rng.randrange(1, R), ops2) for _ in range(50)]
    out = jax.jit(PJ.pairing_batch)(G.encode_points(G.G1, ps),
                                    G.encode_points(G.G2, qs))
    assert T.fq12_decode(out)[0] == SG.pairing_batch(ps, qs)


# ---------------------------------------------------------------------------
# divrem edge vectors (arith.rs:589-785) against the decode paths
# ---------------------------------------------------------------------------

def _u512_bytes(v):
    return v.to_bytes(64, "big")


def test_divrem_roundtrip_random():
    """c1*q + c0 decodes back to (c0, c1) (arith.rs:599-609), via the
    Fq2 64-byte codec."""
    rng = random.Random(77)
    for _ in range(100):
        c0, c1 = rng.randrange(Q), rng.randrange(Q)
        got = SC.fq2_from_slice(_u512_bytes(c1 * Q + c0))
        assert got == (c0, c1)


def test_divrem_modulus_is_one_zero():
    """q == 1*q + 0 (arith.rs:611-626)."""
    assert SC.fq2_from_slice(_u512_bytes(Q)) == (0, 1)


def test_divrem_q_squared_minus_1_and_2():
    """q^2 - 1 == (q-1)q + (q-1); q^2 - 2 == (q-1)q + (q-2)
    (arith.rs:628-696)."""
    assert SC.fq2_from_slice(_u512_bytes(Q * Q - 1)) == (Q - 1, Q - 1)
    assert SC.fq2_from_slice(_u512_bytes(Q * Q - 2)) == (Q - 2, Q - 1)


def test_divrem_overflow_quotients_fail():
    """all-ones, q^2, q^2 + 1: quotient >= q -> invalid Fq2 encoding
    (arith.rs:698-759), but interpret still reduces the remainder."""
    for v in ((1 << 512) - 1, Q * Q, Q * Q + 1):
        with pytest.raises(NotMemberFieldError):
            SC.fq2_from_slice(_u512_bytes(v))
    # remainders match the reference's expected c0 values exactly
    assert SC.fq_interpret(_u512_bytes((1 << 512) - 1)) == \
        0x06d89f71cab8351f47ab1eff0a417ff6b5e71911d44501fbf32cfc5b538afa88
    assert SC.fq_interpret(_u512_bytes(Q * Q)) == 0
    assert SC.fq_interpret(_u512_bytes(Q * Q + 1)) == 1


def test_divrem_fr_masked_valid():
    """512-bit all-ones masked to 59 leading zero bits divides by r with
    both quotient and remainder < r (arith.rs:761-784)."""
    v = (1 << 507) - 1  # 0x07ff..ff, the reference's masked value
    c1, c0 = divmod(v, R)
    assert c1 < R and c0 < R
    assert SC.fr_interpret(_u512_bytes(v)) == c0
