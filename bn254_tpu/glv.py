"""GLV scalar multiplication for G1/G2 (VERDICT r01 item 8).

The reference's scalar mul is plain MSB-first double-and-add over 256 bits
(/root/reference/src/groups/mod.rs:272-292) and stays the parity oracle
(groups.scalar_mul).  This module is the fast path: BN254's curve
y^2 = x^3 + b has the cube-root-of-unity endomorphism

    phi(x, y) = (beta * x, y),   beta^3 = 1 in Fq,

which acts on the r-torsion as multiplication by lambda (lambda^2 +
lambda + 1 = 0 mod r) — on BOTH G1 and the twist G2 (beta scales the Fq2
x-coordinate componentwise; validated against the double-and-add oracle
in tests/test_glv.py).  A scalar k splits as k = k1 + k2*lambda with
|k1|, |k2| < 2^127, halving the ladder to 128 joint steps (Strauss-Shamir
with the 4-entry table {inf, P, phi P, P + phi P}) — ~2x fewer group ops.

All constants are COMPUTED at import (extended Euclid on (r, lambda),
Barrett reciprocals) and asserted, not transcribed.

TPU shape: decomposition is ~3 widening limb products per scalar (jnp
column math, batch-wide); the ladder is a fixed 128-step lax.scan of the
branchless unified add — same kernels as the oracle ladder, half the
steps.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from . import groups as G
from . import limbs as L
from . import tower as T
from .fields import FQ
from .spec.constants import Q, R

__all__ = ["scalar_mul_glv", "decompose", "LAMBDA", "BETA_G1", "BETA_G2",
           "NUM_BITS"]

# --------------------------------------------------------------------------
# Constants (computed, then asserted)
# --------------------------------------------------------------------------

def _cube_root_of_unity(p: int) -> int:
    for g in range(2, 64):
        w = pow(g, (p - 1) // 3, p)
        if w != 1:
            assert pow(w, 3, p) == 1
            return w
    raise AssertionError("no cube root of unity found")


def _glv_setup():
    # the two primitive cube roots mod R; pick the one the curve
    # endomorphism (beta_g1 * x, y) realizes — fixed by the eigenvalue
    # check in tests; here we pin the published pairing (see test_glv).
    lam = _cube_root_of_unity(R)
    if pow(lam, 2, R) < lam:          # normalize: take the smaller root
        lam = pow(lam, 2, R)
    assert (lam * lam + lam + 1) % R == 0

    # beta for G1 pairs with lam; beta for G2 is the other root (their
    # eigenvalues swap between the curve and its twist) — both asserted
    # against scalar_mul in tests.
    w_q = _cube_root_of_unity(Q)
    betas = (w_q, pow(w_q, 2, Q))

    # lattice basis of {(a, b) : a + b*lam = 0 mod R} via extended Euclid
    # (GLV 2001, Algorithm in section 4): walk remainders to ~sqrt(R).
    rs = [(R, 0), (lam, 1)]
    while rs[-1][0] != 0:
        q = rs[-2][0] // rs[-1][0]
        rs.append((rs[-2][0] - q * rs[-1][0], rs[-2][1] - q * rs[-1][1]))
    sq = math.isqrt(R)
    i = next(j for j, (r, _) in enumerate(rs) if r < sq)
    v1 = (rs[i][0], -rs[i][1])
    ca = (rs[i - 1][0], -rs[i - 1][1])
    cb = (rs[i + 1][0], -rs[i + 1][1])
    v2 = ca if max(map(abs, ca)) <= max(map(abs, cb)) else cb
    for a, b in (v1, v2):
        assert (a + b * lam) % R == 0
    det = v1[0] * v2[1] - v2[0] * v1[1]
    assert det == R                     # unimodular up to sign, here +R

    # Barrett reciprocals: b1 = (k*g1 + 2^(s-1)) >> s  ~=  round(k*v2[1]/R)
    s = 270
    g1 = (v2[1] << s) // det
    g2 = ((-v1[1]) << s) // det
    return lam, betas, v1, v2, g1, g2, s


LAMBDA, _BETAS, _V1, _V2, _G1C, _G2C, _SHIFT = _glv_setup()
NUM_BITS = 128                         # |k1|,|k2| < 2^127 (+ Barrett slack)

# which cube root of unity in Fq realizes lambda on each group (validated
# vs the oracle in tests/test_glv.py; the curve and its sextic twist take
# opposite eigenvalues)
BETA_G1 = _BETAS[1] if _BETAS[1] < _BETAS[0] else _BETAS[0]
BETA_G2 = _BETAS[0] if BETA_G1 == _BETAS[1] else _BETAS[1]

_BETA_G1_DEV = None
_BETA_G2_DEV = None


def _beta_arrays():
    global _BETA_G1_DEV, _BETA_G2_DEV
    if _BETA_G1_DEV is None:
        _BETA_G1_DEV = np.asarray(FQ.encode([BETA_G1]))[:, 0]
        _BETA_G2_DEV = np.asarray(FQ.encode([BETA_G2]))[:, 0]
    return _BETA_G1_DEV, _BETA_G2_DEV


# --------------------------------------------------------------------------
# Decomposition (device, batched)
# --------------------------------------------------------------------------

def _const_limbs(v: int, n: int) -> np.ndarray:
    return np.asarray([(v >> (L.LIMB_BITS * i)) & L.MASK for i in range(n)],
                      np.uint32)


def _mul_const_cols(k, cv: np.ndarray):
    """Column sums of k (limb array [N,B]) times a constant limb vector."""
    nk, B = k.shape
    nc = len(cv)
    prod = k[:, None, :] * jnp.asarray(cv)[None, :, None]   # [nk, nc, B]
    lo = prod & L.MASK
    hi = prod >> L.LIMB_BITS
    ncols = nk + nc + 1
    cols = jnp.zeros((ncols, B), jnp.uint32)
    for i in range(nk):
        cols = cols.at[i:i + nc].add(lo[i])
        cols = cols.at[i + 1:i + 1 + nc].add(hi[i])
    return cols                                             # [ncols, B]


def _normalize(cols):
    """Carry-propagate column sums -> exact limbs (list) base 2^16."""
    limbs = []
    c = None
    n = cols.shape[0]
    for i in range(n):
        v = cols[i] if c is None else cols[i] + c
        limbs.append(v & L.MASK)
        c = v >> L.LIMB_BITS
    limbs.append(c & L.MASK)
    return limbs


def _mul_mod_2_256(a_limbs, cv: np.ndarray):
    """a (list of 16 [B] limbs) * constant, truncated mod 2^256."""
    out = [None] * L.N_LIMBS

    def acc(k, v):
        if k < L.N_LIMBS:
            out[k] = v if out[k] is None else out[k] + v

    for i, ai in enumerate(a_limbs):
        if i >= L.N_LIMBS:
            break
        for j, c in enumerate(cv):
            if i + j >= L.N_LIMBS + 1:
                break
            p = ai * np.uint32(c)
            acc(i + j, p & L.MASK)
            acc(i + j + 1, p >> L.LIMB_BITS)
    limbs = []
    c = None
    for k in range(L.N_LIMBS):
        v = (out[k] if out[k] is not None else 0)
        v = v if c is None else v + c
        limbs.append(v & L.MASK)
        c = v >> L.LIMB_BITS
    return limbs


def _sub_mod_2_256(a, b):
    """a - b mod 2^256 on 16-limb lists (two's complement wrap)."""
    limbs = []
    c = None
    for x, y in zip(a, b):
        v = x + ((~y) & L.MASK) + (1 if c is None else c)
        limbs.append(v & L.MASK)
        c = v >> L.LIMB_BITS
    return limbs


def _neg_mod_2_256(a):
    return _sub_mod_2_256([jnp.zeros_like(a[0])] * L.N_LIMBS, a)


def decompose(k):
    """k (canonical limbs [N,B], k < R) -> (|k1|, s1, |k2|, s2).

    k = (-1)^s1 |k1| + (-1)^s2 |k2| * LAMBDA  (mod R), |ki| < 2^127.
    Returned magnitudes are [N,B] limb arrays (high limbs zero).
    """
    nB = 9  # Barrett quotients fit 127+ bits -> 9 limbs

    def barrett(gc):
        cols = _mul_const_cols(k, _const_limbs(gc, 18))
        off_limb, off_bit = divmod(_SHIFT - 1, L.LIMB_BITS)
        cols = cols.at[off_limb].add(np.uint32(1 << off_bit))
        t = _normalize(cols)
        sl, sb = divmod(_SHIFT, L.LIMB_BITS)
        out = []
        for j in range(nB):
            lo = t[sl + j] >> sb
            hi = (t[sl + j + 1] << (L.LIMB_BITS - sb)) & L.MASK
            out.append((lo | hi).astype(jnp.uint32))
        return out

    b1 = barrett(_G1C)
    b2 = barrett(_G2C)

    k_list = [k[i] for i in range(L.N_LIMBS)]
    t1 = _mul_mod_2_256(b1, _const_limbs(_V1[0], 5))
    t2 = _mul_mod_2_256(b2, _const_limbs(_V2[0], 9))
    k1 = _sub_mod_2_256(_sub_mod_2_256(k_list, t1), t2)
    # k2 = -(b1*v1[1] + b2*v2[1]) = b1*|v1[1]| - b2*v2[1]   (v1[1] < 0)
    u1 = _mul_mod_2_256(b1, _const_limbs(-_V1[1], 9))
    u2 = _mul_mod_2_256(b2, _const_limbs(_V2[1], 5))
    k2 = _sub_mod_2_256(u1, u2)

    def sign_abs(v):
        sign = (v[-1] >> (L.LIMB_BITS - 1)).astype(bool)   # [B]
        neg = _neg_mod_2_256(v)
        mag = [jnp.where(sign, nv, pv) for nv, pv in zip(neg, v)]
        return jnp.stack(mag), sign

    a1, s1 = sign_abs(k1)
    a2, s2 = sign_abs(k2)
    return a1, s1, a2, s2


# --------------------------------------------------------------------------
# Endomorphism + joint ladder
# --------------------------------------------------------------------------

def endo(K, p):
    """phi(x, y, z) = (beta x, y, z) — exact on Jacobian coords since beta
    scales only x: (beta X / Z^2, Y / Z^3)."""
    bg1, bg2 = _beta_arrays()
    batch = K.batch_of(p[0])
    if K is G.G1:
        bx = FQ.mul(p[0], L.broadcast_const(bg1, batch))
        return (bx, p[1], p[2])
    bx = T.fq2_scale(p[0], L.broadcast_const(bg2, batch))
    return (bx, p[1], p[2])


def _select_point(K, mask, a, b):
    return tuple(K.select(mask, x, y) for x, y in zip(a, b))


def _ladder_digits(a1, a2):
    """Joint digit planes for the fused ladder kernel: [NUM_BITS, B]
    int32 in {0,1,2,3} = bit_i(a1) + 2*bit_i(a2), MSB-first."""
    rows = []
    for i in range(NUM_BITS - 1, -1, -1):
        limb, sh = divmod(i, L.LIMB_BITS)
        b1 = (a1[limb] >> sh) & 1
        b2 = (a2[limb] >> sh) & 1
        rows.append((b1 + 2 * b2).astype(jnp.int32))
    return jnp.stack(rows, axis=0)


def scalar_mul_glv(K, p, k_limbs):
    """k * p via GLV decomposition + 128-step Strauss-Shamir joint ladder.

    Same group element as groups.scalar_mul (the mod.rs:272-292 oracle);
    Jacobian coordinates may differ — compare with eq_points/to_affine.
    On the fused-kernel path the whole ladder runs inside ONE pallas
    kernel (pallas_fused.glv_ladder), bit-identical to the scan spelling
    below (same k_point_double/add formulas, representative included).
    """
    batch = K.batch_of(p[0])
    a1, s1, a2, s2 = decompose(k_limbs)

    php = endo(K, p)
    p1 = _select_point(K, s1, G.neg(K, p), p)
    p2 = _select_point(K, s2, G.neg(K, php), php)
    p12 = G.add(K, p1, p2)
    inf = G.zero_point(K, batch)

    from .fields import _use_pallas
    if _use_pallas(batch):
        from . import pallas_fused as PF

        ncoords = 1 if K is G.G1 else 2
        digits = _ladder_digits(a1, a2)
        pts = jnp.concatenate(
            [PF.pack(p1), PF.pack(p2), PF.pack(p12)], axis=0)
        out = PF.glv_ladder(ncoords, pts, digits)
        if ncoords == 1:
            return (out[0], out[1], out[2])
        return ((out[0], out[1]), (out[2], out[3]), (out[4], out[5]))

    bit_idx = jnp.arange(NUM_BITS - 1, -1, -1, dtype=jnp.int32)

    def body(res, i):
        res = G.double(K, res)
        limb1 = jax.lax.dynamic_index_in_dim(
            a1, i // L.LIMB_BITS, axis=0, keepdims=False)
        limb2 = jax.lax.dynamic_index_in_dim(
            a2, i // L.LIMB_BITS, axis=0, keepdims=False)
        sh = (i % L.LIMB_BITS).astype(jnp.uint32)
        b1 = ((limb1 >> sh) & 1).astype(bool)
        b2 = ((limb2 >> sh) & 1).astype(bool)
        hi = _select_point(K, b1, p12, p2)     # b2 = 1
        lo = _select_point(K, b1, p1, inf)     # b2 = 0
        t = _select_point(K, b2, hi, lo)
        return G.add(K, res, t), None

    res, _ = jax.lax.scan(body, inf, bit_idx)
    return res
