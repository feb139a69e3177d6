"""Fused tower-op Pallas kernels — the production TPU compute path.

Where pallas_kernels.py fuses a single Montgomery multiply, this module
fuses whole tower operations (fq2 mul/sqr, fq12 mul/sqr/cyclotomic-sqr,
the Miller line fold, the G2 precompute steps, the unified point add) into
single VMEM-resident kernels.  Two wins:

* runtime — one HBM round-trip per tower op instead of one per Fq op
  (an fq12 multiply is 54 Montgomery muls: fused, its intermediates never
  leave VMEM);
* compile time — the XLA graph of a pairing shrinks from ~10^5 ops to a
  few hundred kernel calls, which keeps the axon/TPU AOT compiler well
  under its memory ceiling (the unfused graph OOMs it).

In-kernel representation: an Fq element is a [N_LIMBS, S, 128] uint32
array (limb-major; S*128 batch lanes per grid step).  The Montgomery
multiply accumulates schoolbook columns into a shared [2N, S, 128] VMEM
scratch with static row slices (~300 traced ops; same math as
limbs.mont_mul / reference arith.rs:525-545).  Carry chains use a
two-round split + Kogge-Stone prefix for the final single-bit ripple.

All kernels are bit-exact against the jnp limb path (same canonical
outputs; asserted by the TPU-side tests and golden vectors).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limbs as L
from .spec import constants as C

N = L.N_LIMBS
LB = L.LIMB_BITS
MASK = L.MASK

# default batch-lane tile per grid step (S sublanes x 128 lanes)
_TILE_S = 8

# interpret mode: run every fused kernel through the Pallas interpreter
# (CPU) instead of Mosaic — used by tests/test_pallas_fused.py to verify
# the fused kernels against the jnp limb path without TPU hardware.
_INTERPRET = False


def set_interpret(mode: bool):
    global _INTERPRET
    _INTERPRET = bool(mode)


# ---------------------------------------------------------------------------
# In-kernel field context
# ---------------------------------------------------------------------------

class KCtx:
    """Per-modulus constants + the VMEM scratch ref, threaded through the
    in-kernel formulas.

    Pallas kernels may not capture array constants, so the constant rows
    (q, ~q, one-hot-0, 2^-1, b2) arrive as a [N_CONST, N, 1] input ref.
    """

    N_CONST = 6  # q, notq, one0, two_inv, b2.c0, b2.c1

    @staticmethod
    def const_rows(mod: L.Mod) -> np.ndarray:
        # lane-broadcast ([.., 1, 128]) so in-kernel broadcasts are
        # sublane-only (Mosaic cannot broadcast sublanes+lanes at once)
        rows = np.zeros((KCtx.N_CONST, N, 1, 1), np.uint32)
        rows[0, :, 0, 0] = mod.q_np
        rows[1, :, 0, 0] = mod.notq_np
        rows[2, 0, 0, 0] = 1
        rows[3, :, 0, 0] = mod.encode(pow(2, mod.modulus - 2, mod.modulus))
        rows[4, :, 0, 0] = mod.encode(C.B2[0] % mod.modulus)
        rows[5, :, 0, 0] = mod.encode(C.B2[1] % mod.modulus)
        return np.repeat(rows, 128, axis=3)        # [NC, N, 1, 128]

    def __init__(self, mod: L.Mod, consts_ref, t_ref):
        self.q = consts_ref[0]                      # [N, 1, 128]
        self.notq = consts_ref[1]
        self.one_at_0 = consts_ref[2]
        self.two_inv = consts_ref[3]
        self.b2 = (consts_ref[4], consts_ref[5])
        self.qinv = int(mod.qinv)
        self.t_ref = t_ref

    # -- carry helpers ----------------------------------------------------

    @staticmethod
    def _shift_up(x, d):
        """x[k] -> position k+d along the limb axis (zeros shifted in)."""
        return jnp.concatenate([jnp.zeros_like(x[:d]), x[:-d]], axis=0)

    def _ripple(self, s):
        """Resolve single-bit carries: s limbs <= 2^17-1 with the property
        that adding the carried bits can ripple.  Returns (limbs, carry_out)
        via a Kogge-Stone prefix over (generate, propagate)."""
        l = s & MASK
        c = s >> LB                       # in {0,1}
        # add the carry of limb k into limb k+1: G/P prefix
        g = c.astype(jnp.uint32)
        p = (l == MASK).astype(jnp.uint32)
        for d in (1, 2, 4, 8):
            g = g | (p & self._shift_up(g, d))
            p = p & self._shift_up(p, d)
        carry_in = self._shift_up(g, 1)
        out = (l + carry_in) & MASK
        return out, g[N - 1]

    def norm_wide(self, r):
        """Carry-normalize rows with multi-bit carries (< 2^23)."""
        l = r & MASK
        c = r >> LB                       # up to ~2^7
        s = l + self._shift_up(c, 1)      # limbs < 2^17
        out, _ = self._ripple(s)
        return out

    def cond_sub(self, r):
        """r - q if r >= q, branchless (limbs.cond_sub)."""
        v = r + self.notq + self.one_at_0     # limbs < 2^17
        s, carry_out = self._ripple(v)
        ge = (carry_out > 0)[None]
        return jnp.where(ge, s, r)

    # -- field ops --------------------------------------------------------

    def add(self, a, b):
        s, _ = self._ripple(a + b)        # a+b < 2q < 2^256: no carry-out
        return self.cond_sub(s)

    def sub(self, a, b):
        v = a + self.q + ((~b) & MASK) + self.one_at_0  # < 3*2^16: 2-bit c
        s = (v & MASK) + self._shift_up(v >> LB, 1)
        s, _ = self._ripple(s)            # drop the 2^256 wrap
        return self.cond_sub(s)

    def neg(self, a):
        v = self.q + ((~a) & MASK) + self.one_at_0
        s, _ = self._ripple(v)
        return self.cond_sub(s)

    def double(self, a):
        return self.add(a, a)

    def mul9(self, a):
        return self.add(self.double(self.double(self.double(a))), a)

    def mul(self, a, b):
        """Montgomery product via the shared [2N,S,128] scratch."""
        t = self.t_ref
        t[...] = jnp.zeros_like(t[...])
        for i in range(N):
            p = a[i][None] * b            # [N,S,128]
            t[i:i + N] = t[i:i + N] + (p & MASK)
            t[i + 1:i + N + 1] = t[i + 1:i + N + 1] + (p >> LB)
        for i in range(N):
            m = (t[i] * self.qinv) & MASK
            p = m[None] * self.q          # [N,S,128]
            t[i:i + N] = t[i:i + N] + (p & MASK)
            t[i + 1:i + N + 1] = t[i + 1:i + N + 1] + (p >> LB)
            t[i + 1] = t[i + 1] + (t[i] >> LB)
        r = self.norm_wide(t[N:2 * N])
        return self.cond_sub(r)

    def sqr(self, a):
        """Montgomery square: off-diagonal products counted twice, so the
        product phase does ~N^2/2 multiplies instead of N^2 (value-
        identical to mul(a, a))."""
        t = self.t_ref
        t[...] = jnp.zeros_like(t[...])
        for i in range(N):
            p = a[i][None] * a[i:]        # [N-i,S,128], j = i..N-1
            lo = p & MASK
            hi = p >> LB
            # diagonal once + off-diagonal twice: add full slice, then
            # re-add the off-diagonal tail
            t[2 * i:i + N] = t[2 * i:i + N] + lo
            t[2 * i + 1:i + N + 1] = t[2 * i + 1:i + N + 1] + hi
            if i + 1 < N:
                t[2 * i + 1:i + N] = t[2 * i + 1:i + N] + lo[1:]
                t[2 * i + 2:i + N + 1] = t[2 * i + 2:i + N + 1] + hi[1:]
        for i in range(N):
            m = (t[i] * self.qinv) & MASK
            p = m[None] * self.q          # [N,S,128]
            t[i:i + N] = t[i:i + N] + (p & MASK)
            t[i + 1:i + N + 1] = t[i + 1:i + N + 1] + (p >> LB)
            t[i + 1] = t[i + 1] + (t[i] >> LB)
        r = self.norm_wide(t[N:2 * N])
        return self.cond_sub(r)

    def select(self, mask, a, b):
        return jnp.where(mask[None], a, b)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)


# ---------------------------------------------------------------------------
# In-kernel tower formulas (identical algebra to bn254_tpu.tower)
# ---------------------------------------------------------------------------

def kfq2_add(K, a, b):
    return (K.add(a[0], b[0]), K.add(a[1], b[1]))


def kfq2_sub(K, a, b):
    return (K.sub(a[0], b[0]), K.sub(a[1], b[1]))


def kfq2_neg(K, a):
    return (K.neg(a[0]), K.neg(a[1]))


def kfq2_scale(K, a, k):
    return (K.mul(a[0], k), K.mul(a[1], k))


def kfq2_mul(K, a, b):
    aa = K.mul(a[0], b[0])
    bb = K.mul(a[1], b[1])
    cross = K.mul(K.add(a[0], a[1]), K.add(b[0], b[1]))
    return (K.sub(aa, bb), K.sub(K.sub(cross, aa), bb))


def kfq2_sqr(K, a):
    ab = K.mul(a[0], a[1])
    t = K.mul(K.add(a[0], a[1]), K.sub(a[0], a[1]))
    return (t, K.add(ab, ab))


def kfq2_mul_by_xi(K, a):
    return (K.sub(K.mul9(a[0]), a[1]), K.add(K.mul9(a[1]), a[0]))


def kfq6_add(K, a, b):
    return tuple(kfq2_add(K, x, y) for x, y in zip(a, b))


def kfq6_sub(K, a, b):
    return tuple(kfq2_sub(K, x, y) for x, y in zip(a, b))


def kfq6_neg(K, a):
    return tuple(kfq2_neg(K, x) for x in a)


def kfq6_mul_by_nonresidue(K, a):
    return (kfq2_mul_by_xi(K, a[2]), a[0], a[1])


def kfq6_mul(K, a, b):
    a_a = kfq2_mul(K, a[0], b[0])
    b_b = kfq2_mul(K, a[1], b[1])
    c_c = kfq2_mul(K, a[2], b[2])
    c0 = kfq2_add(K, kfq2_mul_by_xi(K, kfq2_sub(K, kfq2_sub(K,
        kfq2_mul(K, kfq2_add(K, a[1], a[2]), kfq2_add(K, b[1], b[2])),
        b_b), c_c)), a_a)
    c1 = kfq2_add(K, kfq2_sub(K, kfq2_sub(K,
        kfq2_mul(K, kfq2_add(K, a[0], a[1]), kfq2_add(K, b[0], b[1])),
        a_a), b_b), kfq2_mul_by_xi(K, c_c))
    c2 = kfq2_sub(K, kfq2_add(K, kfq2_sub(K,
        kfq2_mul(K, kfq2_add(K, a[0], a[2]), kfq2_add(K, b[0], b[2])),
        a_a), b_b), c_c)
    return (c0, c1, c2)


def kfq6_sqr(K, a):
    s0 = kfq2_sqr(K, a[0])
    ab = kfq2_mul(K, a[0], a[1])
    s1 = kfq2_add(K, ab, ab)
    s2 = kfq2_sqr(K, kfq2_add(K, kfq2_sub(K, a[0], a[1]), a[2]))
    bc = kfq2_mul(K, a[1], a[2])
    s3 = kfq2_add(K, bc, bc)
    s4 = kfq2_sqr(K, a[2])
    return (
        kfq2_add(K, s0, kfq2_mul_by_xi(K, s3)),
        kfq2_add(K, s1, kfq2_mul_by_xi(K, s4)),
        kfq2_sub(K, kfq2_sub(K, kfq2_add(K, kfq2_add(K, s1, s2), s3),
                 s0), s4),
    )


def kfq12_mul(K, a, b):
    aa = kfq6_mul(K, a[0], b[0])
    bb = kfq6_mul(K, a[1], b[1])
    cross = kfq6_mul(K, kfq6_add(K, a[0], a[1]), kfq6_add(K, b[0], b[1]))
    return (
        kfq6_add(K, kfq6_mul_by_nonresidue(K, bb), aa),
        kfq6_sub(K, kfq6_sub(K, cross, aa), bb),
    )


def kfq12_sqr(K, a):
    ab = kfq6_mul(K, a[0], a[1])
    return (
        kfq6_sub(K, kfq6_sub(K,
            kfq6_mul(K, kfq6_add(K, kfq6_mul_by_nonresidue(K, a[1]), a[0]),
                     kfq6_add(K, a[0], a[1])), ab),
            kfq6_mul_by_nonresidue(K, ab)),
        kfq6_add(K, ab, ab),
    )


def kfq12_mul_by_024(K, a, x0, x2, x4):
    (z0, z1, z2), (z3, z4, z5) = a

    d0 = kfq2_mul(K, z0, x0)
    d2 = kfq2_mul(K, z2, x2)
    d4 = kfq2_mul(K, z4, x4)
    t2 = kfq2_add(K, z0, z4)
    t1 = kfq2_add(K, z0, z2)
    s0 = kfq2_add(K, kfq2_add(K, z1, z3), z5)

    s1 = kfq2_mul(K, z1, x2)
    t3 = kfq2_add(K, s1, d4)
    t4 = kfq2_add(K, kfq2_mul_by_xi(K, t3), d0)
    nz0 = t4

    t3 = kfq2_mul(K, z5, x4)
    s1 = kfq2_add(K, s1, t3)
    t3 = kfq2_add(K, t3, d2)
    t4 = kfq2_mul_by_xi(K, t3)
    t3 = kfq2_mul(K, z1, x0)
    s1 = kfq2_add(K, s1, t3)
    t4 = kfq2_add(K, t4, t3)
    nz1 = t4

    t0 = kfq2_add(K, x0, x2)
    t3 = kfq2_sub(K, kfq2_sub(K, kfq2_mul(K, t1, t0), d0), d2)
    t4 = kfq2_mul(K, z3, x4)
    s1 = kfq2_add(K, s1, t4)
    t3 = kfq2_add(K, t3, t4)

    t0 = kfq2_add(K, z2, z4)
    nz2 = t3

    t1 = kfq2_add(K, x2, x4)
    t3 = kfq2_sub(K, kfq2_sub(K, kfq2_mul(K, t0, t1), d2), d4)
    t4 = kfq2_mul_by_xi(K, t3)
    t3 = kfq2_mul(K, z3, x0)
    s1 = kfq2_add(K, s1, t3)
    t4 = kfq2_add(K, t4, t3)
    nz3 = t4

    t3 = kfq2_mul(K, z5, x2)
    s1 = kfq2_add(K, s1, t3)
    t4 = kfq2_mul_by_xi(K, t3)
    t0 = kfq2_add(K, x0, x4)
    t3 = kfq2_sub(K, kfq2_sub(K, kfq2_mul(K, t2, t0), d0), d4)
    t4 = kfq2_add(K, t4, t3)
    nz4 = t4

    t0 = kfq2_add(K, kfq2_add(K, x0, x2), x4)
    t3 = kfq2_sub(K, kfq2_mul(K, s0, t0), s1)
    nz5 = t3

    return ((nz0, nz1, nz2), (nz3, nz4, nz5))


def kfq12_cyclotomic_sqr(K, a):
    (z0, z4, z3), (z2, z1, z5) = a

    def _sq_pair(u, v):
        tmp = kfq2_mul(K, u, v)
        t_a = kfq2_sub(K, kfq2_sub(K,
            kfq2_mul(K, kfq2_add(K, u, v),
                     kfq2_add(K, kfq2_mul_by_xi(K, v), u)), tmp),
            kfq2_mul_by_xi(K, tmp))
        t_b = kfq2_add(K, tmp, tmp)
        return t_a, t_b

    t0, t1 = _sq_pair(z0, z1)
    t2, t3 = _sq_pair(z2, z3)
    t4, t5 = _sq_pair(z4, z5)

    def _tri(base, t, sub):
        x = kfq2_sub(K, t, base) if sub else kfq2_add(K, t, base)
        x = kfq2_add(K, x, x)
        return kfq2_add(K, x, t)

    nz0 = _tri(z0, t0, True)
    nz1 = _tri(z1, t1, False)
    tmp = kfq2_mul_by_xi(K, t5)
    nz2 = _tri(z2, tmp, False)
    nz3 = _tri(z3, t4, True)
    nz4 = _tri(z4, t2, True)
    nz5 = _tri(z5, t3, False)

    return ((nz0, nz4, nz3), (nz2, nz1, nz5))


# ---------------------------------------------------------------------------
# In-kernel group law (branchless; mirrors bn254_tpu.groups)
# ---------------------------------------------------------------------------

class FqA:
    """Base-field adapter: Fq (1 coordinate per element)."""
    COORDS = 1

    @staticmethod
    def read(ref, c):
        return ref[c]

    @staticmethod
    def write(ref, c, v):
        ref[c] = v

    add = staticmethod(lambda K, a, b: K.add(a, b))
    sub = staticmethod(lambda K, a, b: K.sub(a, b))
    neg = staticmethod(lambda K, a: K.neg(a))
    mul = staticmethod(lambda K, a, b: K.mul(a, b))
    sqr = staticmethod(lambda K, a: K.sqr(a))
    is_zero = staticmethod(lambda K, a: K.is_zero(a))
    eq = staticmethod(lambda K, a, b: K.eq(a, b))
    select = staticmethod(lambda K, m, a, b: K.select(m, a, b))


class Fq2A:
    """Base-field adapter: Fq2 (2 coordinates per element)."""
    COORDS = 2

    @staticmethod
    def read(ref, c):
        return (ref[c], ref[c + 1])

    @staticmethod
    def write(ref, c, v):
        ref[c] = v[0]
        ref[c + 1] = v[1]

    add = staticmethod(kfq2_add)
    sub = staticmethod(kfq2_sub)
    neg = staticmethod(kfq2_neg)
    mul = staticmethod(kfq2_mul)
    sqr = staticmethod(kfq2_sqr)

    @staticmethod
    def is_zero(K, a):
        return K.is_zero(a[0]) & K.is_zero(a[1])

    @staticmethod
    def eq(K, a, b):
        return K.eq(a[0], b[0]) & K.eq(a[1], b[1])

    @staticmethod
    def select(K, m, a, b):
        return (K.select(m, a[0], b[0]), K.select(m, a[1], b[1]))


def k_point_double(K, A, p):
    """dbl-2009-l Jacobian doubling (groups.double formula)."""
    x, y, z = p
    a = A.sqr(K, x)
    b = A.sqr(K, y)
    c = A.sqr(K, b)
    d = A.sub(K, A.sub(K, A.sqr(K, A.add(K, x, b)), a), c)
    d = A.add(K, d, d)
    e = A.add(K, A.add(K, a, a), a)
    f = A.sqr(K, e)
    x3 = A.sub(K, f, A.add(K, d, d))
    ec = A.add(K, c, c)
    ec = A.add(K, ec, ec)
    ec = A.add(K, ec, ec)
    y1z1 = A.mul(K, y, z)
    return (x3,
            A.sub(K, A.mul(K, e, A.sub(K, d, x3)), ec),
            A.add(K, y1z1, y1z1))


def k_point_add(K, A, p, q):
    """Unified branchless Jacobian add (groups.add formula)."""
    p_inf = A.is_zero(K, p[2])
    q_inf = A.is_zero(K, q[2])

    z1s = A.sqr(K, p[2])
    z2s = A.sqr(K, q[2])
    u1 = A.mul(K, p[0], z2s)
    u2 = A.mul(K, q[0], z1s)
    z1c = A.mul(K, p[2], z1s)
    z2c = A.mul(K, q[2], z2s)
    s1 = A.mul(K, p[1], z2c)
    s2 = A.mul(K, q[1], z1c)

    coincide = A.eq(K, u1, u2) & A.eq(K, s1, s2) & ~p_inf & ~q_inf

    h = A.sub(K, u2, u1)
    d = A.sub(K, s2, s1)
    rr = A.add(K, d, d)
    i = A.sqr(K, A.add(K, h, h))
    j = A.mul(K, h, i)
    v = A.mul(K, u1, i)
    s1j = A.mul(K, s1, j)
    x3 = A.sub(K, A.sub(K, A.sqr(K, rr), j), A.add(K, v, v))
    y3 = A.sub(K, A.mul(K, rr, A.sub(K, v, x3)), A.add(K, s1j, s1j))
    z3 = A.mul(K, A.sub(K, A.sub(K, A.sqr(K, A.add(K, p[2], q[2])),
                                 z1s), z2s), h)
    generic = (x3, y3, z3)

    dbl = k_point_double(K, A, p)

    out = tuple(A.select(K, coincide, a, b) for a, b in zip(dbl, generic))
    out = tuple(A.select(K, q_inf, a, b) for a, b in zip(p, out))
    out = tuple(A.select(K, p_inf, a, b) for a, b in zip(q, out))
    return out


def _point_of(ref, A):
    c = A.COORDS
    return (A.read(ref, 0), A.read(ref, c), A.read(ref, 2 * c))


def _write_point(ref, A, v):
    c = A.COORDS
    A.write(ref, 0, v[0])
    A.write(ref, c, v[1])
    A.write(ref, 2 * c, v[2])


# ---------------------------------------------------------------------------
# Packing: tower pytrees <-> [C, N, B] coordinate stacks
# ---------------------------------------------------------------------------

def pack(tree):
    """Tuple-nested Fq leaves ([N, B] each) -> [C, N, B]."""
    return jnp.stack(jax.tree.leaves(tree), axis=0)


def unpack_fq2(arr):
    return (arr[0], arr[1])


def unpack_fq12(arr):
    return (((arr[0], arr[1]), (arr[2], arr[3]), (arr[4], arr[5])),
            ((arr[6], arr[7]), (arr[8], arr[9]), (arr[10], arr[11])))


def _fq2_of(ref, c):
    return (ref[c], ref[c + 1])


def _write_fq2(ref, c, v):
    ref[c] = v[0]
    ref[c + 1] = v[1]


def _read_fq12(ref):
    return (((ref[0], ref[1]), (ref[2], ref[3]), (ref[4], ref[5])),
            ((ref[6], ref[7]), (ref[8], ref[9]), (ref[10], ref[11])))


def _write_fq12(ref, v):
    (c00, c01, c02), (c10, c11, c12) = v
    for i, fq2v in enumerate((c00, c01, c02, c10, c11, c12)):
        ref[2 * i] = fq2v[0]
        ref[2 * i + 1] = fq2v[1]


# ---------------------------------------------------------------------------
# pallas_call factories
# ---------------------------------------------------------------------------

_MOD_FQ = None


def _fq_mod():
    global _MOD_FQ
    if _MOD_FQ is None:
        _MOD_FQ = L.Mod(C.Q)
    return _MOD_FQ


def _specs(coord_counts, batch, tile_s, interpret=False):
    sub = tile_s
    while batch % (sub * 128) and sub > 1:
        sub //= 2
    grid = batch // (sub * 128)
    ms = pltpu.ANY if interpret else pltpu.VMEM
    specs = [
        pl.BlockSpec((c, N, sub, 128), lambda i: (0, 0, i, 0),
                     memory_space=ms)
        for c in coord_counts
    ]
    return grid, sub, specs


def _shape3(c, batch):
    return (c, N, batch // 128, 128)


def _to3(a, c, batch):
    return a.reshape(c, N, batch // 128, 128)


def _from3(a, c, batch):
    return a.reshape(c, N, batch)


def _call(which: str, batch: int, tile_s: int = _TILE_S):
    return _call_impl(which, batch, tile_s, _INTERPRET)


@functools.lru_cache(maxsize=None)
def _call_impl(which: str, batch: int, tile_s: int, interpret: bool):
    """Build (and cache) the pallas_call wrapper for a fused op."""
    mod = _fq_mod()

    in_coords = {
        "fq2_mul": (2, 2), "fq2_sqr": (2,),
        "fq12_mul": (12, 12), "fq12_sqr": (12,), "fq12_cyc_sqr": (12,),
        "fq12_fold_line": (12, 6, 1, 1),
        "g2_dbl_step": (6,),
        "g2_add_step": (6, 4),
        "g1_add": (3, 3), "g1_dbl": (3,),
        "g2_add": (6, 6), "g2_dbl": (6,),
    }[which]
    out_coords = {
        "fq2_mul": (2,), "fq2_sqr": (2,),
        "fq12_mul": (12,), "fq12_sqr": (12,), "fq12_cyc_sqr": (12,),
        "fq12_fold_line": (12,),
        "g2_dbl_step": (6, 6),
        "g2_add_step": (6, 6),
        "g1_add": (3,), "g1_dbl": (3,),
        "g2_add": (6,), "g2_dbl": (6,),
    }[which]

    def kernel(*refs):
        consts_ref = refs[0]
        ins = refs[1:1 + len(in_coords)]
        outs = refs[1 + len(in_coords):1 + len(in_coords) + len(out_coords)]
        t_ref = refs[-1]
        K = KCtx(mod, consts_ref, t_ref)
        if which == "fq2_mul":
            _write_fq2(outs[0], 0, kfq2_mul(K, _fq2_of(ins[0], 0),
                                            _fq2_of(ins[1], 0)))
        elif which == "fq2_sqr":
            _write_fq2(outs[0], 0, kfq2_sqr(K, _fq2_of(ins[0], 0)))
        elif which == "fq12_mul":
            _write_fq12(outs[0], kfq12_mul(K, _read_fq12(ins[0]),
                                           _read_fq12(ins[1])))
        elif which == "fq12_sqr":
            _write_fq12(outs[0], kfq12_sqr(K, _read_fq12(ins[0])))
        elif which == "fq12_cyc_sqr":
            _write_fq12(outs[0], kfq12_cyclotomic_sqr(K, _read_fq12(ins[0])))
        elif which == "fq12_fold_line":
            f = _read_fq12(ins[0])
            ell_0 = _fq2_of(ins[1], 0)
            ell_vw = _fq2_of(ins[1], 2)
            ell_vv = _fq2_of(ins[1], 4)
            px = ins[2][0]
            py = ins[3][0]
            x2 = kfq2_scale(K, ell_vv, px)
            x4 = kfq2_scale(K, ell_vw, py)
            _write_fq12(outs[0], kfq12_mul_by_024(K, f, ell_0, x2, x4))
        elif which == "g2_dbl_step":
            _g2_dbl_step_kernel(K, ins, outs)
        elif which == "g2_add_step":
            _g2_add_step_kernel(K, ins, outs)
        elif which in ("g1_add", "g2_add"):
            A = FqA if which == "g1_add" else Fq2A
            _write_point(outs[0], A,
                         k_point_add(K, A, _point_of(ins[0], A),
                                     _point_of(ins[1], A)))
        elif which in ("g1_dbl", "g2_dbl"):
            A = FqA if which == "g1_dbl" else Fq2A
            _write_point(outs[0], A,
                         k_point_double(K, A, _point_of(ins[0], A)))
        else:
            raise ValueError(which)

    def build(batch):
        grid, sub, in_specs = _specs(in_coords, batch, tile_s, interpret)
        _, _, out_specs = _specs(out_coords, batch, tile_s, interpret)
        const_spec = pl.BlockSpec(
            (KCtx.N_CONST, N, 1, 128), lambda i: (0, 0, 0, 0),
            memory_space=pltpu.ANY if interpret else pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=tuple(jax.ShapeDtypeStruct(_shape3(c, batch),
                                                 jnp.uint32)
                            for c in out_coords),
            grid=(grid,),
            in_specs=[const_spec] + in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=[pltpu.VMEM((2 * N, sub, 128), jnp.uint32)],
            interpret=interpret,
        )

    call = build(batch)
    # keep as numpy: _call is cached across traces, and a jnp array built
    # under one jit trace must not leak into another
    consts_np = KCtx.const_rows(mod)

    def run(*arrs):
        ins = [_to3(a, c, batch) for a, c in zip(arrs, in_coords)]
        outs = call(jnp.asarray(consts_np), *ins)
        outs = tuple(_from3(o, c, batch)
                     for o, c in zip(outs, out_coords))
        return outs if len(outs) > 1 else outs[0]

    return run


def _g2_dbl_step_kernel(K, ins, outs):
    """Miller doubling step (groups/mod.rs:754-776) on packed G2 Jacobian
    [x0 x1 y0 y1 z0 z1]; outputs (new point, ell coeffs [6])."""
    x = _fq2_of(ins[0], 0)
    y = _fq2_of(ins[0], 2)
    z = _fq2_of(ins[0], 4)
    two_inv = jnp.broadcast_to(K.two_inv, x[0].shape)
    b2c = _bcast_fq2(K.b2, x)

    a = kfq2_scale(K, kfq2_mul(K, x, y), two_inv)
    b = kfq2_sqr(K, y)
    c = kfq2_sqr(K, z)
    d = kfq2_add(K, kfq2_add(K, c, c), c)
    e = kfq2_mul(K, b2c, d)
    f = kfq2_add(K, kfq2_add(K, e, e), e)
    g = kfq2_scale(K, kfq2_add(K, b, f), two_inv)
    h = kfq2_sub(K, kfq2_sqr(K, kfq2_add(K, y, z)), kfq2_add(K, b, c))
    i = kfq2_sub(K, e, b)
    j = kfq2_sqr(K, x)
    e_sq = kfq2_sqr(K, e)

    nx = kfq2_mul(K, a, kfq2_sub(K, b, f))
    ny = kfq2_sub(K, kfq2_sqr(K, g),
                  kfq2_add(K, kfq2_add(K, e_sq, e_sq), e_sq))
    nz = kfq2_mul(K, b, h)

    ell_0 = kfq2_mul_by_xi(K, i)
    ell_vw = kfq2_neg(K, h)
    ell_vv = kfq2_add(K, kfq2_add(K, j, j), j)

    _write_fq2(outs[0], 0, nx)
    _write_fq2(outs[0], 2, ny)
    _write_fq2(outs[0], 4, nz)
    _write_fq2(outs[1], 0, ell_0)
    _write_fq2(outs[1], 2, ell_vw)
    _write_fq2(outs[1], 4, ell_vv)


def _g2_add_step_kernel(K, ins, outs):
    """Mixed addition step (groups/mod.rs:731-752); base affine packed
    [bx0 bx1 by0 by1]."""
    x = _fq2_of(ins[0], 0)
    y = _fq2_of(ins[0], 2)
    z = _fq2_of(ins[0], 4)
    bx = _fq2_of(ins[1], 0)
    by = _fq2_of(ins[1], 2)

    d = kfq2_sub(K, x, kfq2_mul(K, z, bx))
    e = kfq2_sub(K, y, kfq2_mul(K, z, by))
    f = kfq2_sqr(K, d)
    g = kfq2_sqr(K, e)
    h = kfq2_mul(K, d, f)
    i = kfq2_mul(K, x, f)
    j = kfq2_sub(K, kfq2_add(K, kfq2_mul(K, z, g), h), kfq2_add(K, i, i))

    nx = kfq2_mul(K, d, j)
    ny = kfq2_sub(K, kfq2_mul(K, e, kfq2_sub(K, i, j)), kfq2_mul(K, h, y))
    nz = kfq2_mul(K, z, h)

    ell_0 = kfq2_mul_by_xi(K, kfq2_sub(K, kfq2_mul(K, e, bx),
                                       kfq2_mul(K, d, by)))
    ell_vw = d
    ell_vv = kfq2_neg(K, e)

    _write_fq2(outs[0], 0, nx)
    _write_fq2(outs[0], 2, ny)
    _write_fq2(outs[0], 4, nz)
    _write_fq2(outs[1], 0, ell_0)
    _write_fq2(outs[1], 2, ell_vw)
    _write_fq2(outs[1], 4, ell_vv)


def _bcast_fq2(cst, like):
    return (jnp.broadcast_to(cst[0], like[0].shape),
            jnp.broadcast_to(cst[1], like[1].shape))


# ---------------------------------------------------------------------------
# Public wrappers (tower-pytree in/out)
# ---------------------------------------------------------------------------

def fq2_mul(a, b):
    batch = a[0].shape[1]
    return unpack_fq2(_call("fq2_mul", batch)(pack(a), pack(b)))


def fq2_sqr(a):
    batch = a[0].shape[1]
    return unpack_fq2(_call("fq2_sqr", batch)(pack(a)))


def fq12_mul(a, b):
    batch = a[0][0][0].shape[1]
    return unpack_fq12(_call("fq12_mul", batch)(pack(a), pack(b)))


def fq12_sqr(a):
    batch = a[0][0][0].shape[1]
    return unpack_fq12(_call("fq12_sqr", batch)(pack(a)))


def fq12_cyclotomic_sqr(a):
    batch = a[0][0][0].shape[1]
    return unpack_fq12(_call("fq12_cyc_sqr", batch)(pack(a)))


def fq12_fold_line(f, coeff, px, py):
    """f(mul_by_024) with the px/py line scaling fused in.

    coeff: (ell_0, ell_vw, ell_vv) fq2 triple; px, py: [N, B] Fq batches.
    """
    batch = px.shape[1]
    cpacked = pack(coeff)                 # [6, N, B]
    return unpack_fq12(
        _call("fq12_fold_line", batch)(
            pack(f), cpacked, px[None], py[None]))


def g2_dbl_step(r):
    """r: ((x),(y),(z)) fq2 tuple-of-pairs; returns (new_r, coeffs)."""
    batch = r[0][0].shape[1]
    nr, cf = _call("g2_dbl_step", batch)(pack(r))
    return _unpack_g2(nr), _unpack_coeffs(cf)


def g2_add_step(r, base):
    batch = r[0][0].shape[1]
    nr, cf = _call("g2_add_step", batch)(pack(r), pack(base))
    return _unpack_g2(nr), _unpack_coeffs(cf)


def _unpack_g2(arr):
    return ((arr[0], arr[1]), (arr[2], arr[3]), (arr[4], arr[5]))


def _unpack_coeffs(arr):
    return ((arr[0], arr[1]), (arr[2], arr[3]), (arr[4], arr[5]))


# ---------------------------------------------------------------------------
# Whole-ladder pow kernels: the 254-step Fermat inversion and the 62-step
# cyclotomic z-power run as a fori_loop INSIDE one kernel instead of ~500
# sequential kernel launches from a lax.scan.  Exponent bits arrive as an
# SMEM input (MSB-first, leading 1 dropped; res starts at the base).
# ---------------------------------------------------------------------------

def _pow_call(which: str, batch: int, nbits: int, tile_s: int = _TILE_S):
    return _pow_call_impl(which, batch, nbits, tile_s, _INTERPRET)


@functools.lru_cache(maxsize=None)
def _pow_call_impl(which: str, batch: int, nbits: int, tile_s: int,
                   interpret: bool):
    mod = _fq_mod()
    coords = {"fq_pow": 1, "fq12_cyc_pow": 12}[which]

    def kernel(consts_ref, bits_ref, a_ref, out_ref, t_ref):
        K = KCtx(mod, consts_ref, t_ref)
        if which == "fq_pow":
            a = a_ref[0]

            def body(i, res):
                res = K.sqr(res)
                m = K.mul(res, a)
                bit = bits_ref[i, 0]
                return jnp.where(bit > 0, m, res)

            res = jax.lax.fori_loop(0, nbits, body, a)
            out_ref[0] = res
        else:
            a = _read_fq12(a_ref)

            def body(i, res):
                res = kfq12_cyclotomic_sqr(K, res)
                m = kfq12_mul(K, a, res)
                bit = bits_ref[i, 0]
                sel = jnp.where(bit > 0, jnp.uint32(1), jnp.uint32(0))
                mask = (sel > 0)[None, None]
                return jax.tree.map(
                    lambda x, y: jnp.where(mask, x, y), m, res)

            res = jax.lax.fori_loop(0, nbits, body, a)
            _write_fq12(out_ref, res)

    sub = tile_s
    while batch % (sub * 128) and sub > 1:
        sub //= 2
    grid = batch // (sub * 128)
    ms = pltpu.ANY if interpret else pltpu.VMEM
    const_spec = pl.BlockSpec((KCtx.N_CONST, N, 1, 128),
                              lambda i: (0, 0, 0, 0),
                              memory_space=ms)
    bits_spec = pl.BlockSpec((nbits, 1), lambda i: (0, 0),
                             memory_space=pltpu.ANY if interpret
                             else pltpu.SMEM)
    a_spec = pl.BlockSpec((coords, N, sub, 128), lambda i: (0, 0, i, 0),
                          memory_space=ms)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(_shape3(coords, batch), jnp.uint32),
        grid=(grid,),
        in_specs=[const_spec, bits_spec, a_spec],
        out_specs=a_spec,
        scratch_shapes=[pltpu.VMEM((2 * N, sub, 128), jnp.uint32)],
        interpret=interpret,
    )
    consts_np = KCtx.const_rows(mod)

    def run(a_packed, bits_np):
        return _from3(call(jnp.asarray(consts_np), jnp.asarray(bits_np),
                           _to3(a_packed, coords, batch)), coords, batch)

    return run


def _msb_bits(e: int) -> np.ndarray:
    """MSB-first bits of e with the leading 1 dropped -> [nbits, 1] i32."""
    nb = e.bit_length()
    return np.array([[(e >> i) & 1] for i in range(nb - 2, -1, -1)],
                    dtype=np.int32)


def fq_pow(a, e: int):
    """a^e with a STATIC exponent, one fused ladder kernel.

    Matches fields.FieldCtx.pow_const bit-for-bit (MSB-first square-and-
    multiply, fields/mod.rs:35-46)."""
    assert e >= 1
    batch = a.shape[1]
    bits = _msb_bits(e)
    if len(bits) == 0:
        return a
    return _pow_call("fq_pow", batch, len(bits))(a[None], bits)[0]


def fq12_cyclotomic_pow_z(a):
    """a^z for the BN parameter z (fq12.rs:249-267, z at :122), one fused
    ladder kernel (62 cyclotomic squarings + 11 multiplies)."""
    batch = a[0][0][0].shape[1]
    bits = _msb_bits(C.Z)
    return unpack_fq12(
        _pow_call("fq12_cyc_pow", batch, len(bits))(pack(a), bits))


def _unpack_point_g1(arr):
    return (arr[0], arr[1], arr[2])


def point_add(group_coords: int, p, q):
    """Fused unified Jacobian add; group_coords 1 = G1 (Fq), 2 = G2 (Fq2).

    p, q: groups.py point pytrees."""
    which = "g1_add" if group_coords == 1 else "g2_add"
    batch = jax.tree.leaves(p)[0].shape[1]
    out = _call(which, batch)(pack(p), pack(q))
    return (_unpack_point_g1(out) if group_coords == 1
            else _unpack_g2(out))


def point_double(group_coords: int, p):
    which = "g1_dbl" if group_coords == 1 else "g2_dbl"
    batch = jax.tree.leaves(p)[0].shape[1]
    out = _call(which, batch)(pack(p))
    return (_unpack_point_g1(out) if group_coords == 1
            else _unpack_g2(out))


def available() -> bool:
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return "tpu" in plat or "axon" in plat
