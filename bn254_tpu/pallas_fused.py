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

In-kernel representation: an Fq element is a LIST of N_LIMBS per-limb
[S, 128] uint32 arrays (each limb one native vreg stack; S*128 batch
lanes per grid step) with sequential carry chains — see the KCtx
docstring.  The Montgomery multiply is CIOS on these limb lists (same
math as limbs.mont_mul / reference arith.rs:525-545); with
BN254_LAZY_FQ2=1 the tower multiplies keep whole multiply graphs in a
signed-int32 column domain and reduce once per output coefficient.

All kernels are bit-exact against the jnp limb path (same canonical
outputs; asserted by the TPU-side golden vectors and the interpret/
emulated-body tests in tests/test_pallas_fused.py).
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

# default batch-lane tile per grid step (S sublanes x 128 lanes).
# BN254_TILE_S overrides for perf experiments (sub-vreg values < 8 waste
# lane occupancy; larger values grow each grid cell's VMEM working set).
import os as _os

_TILE_S = int(_os.environ.get("BN254_TILE_S", "8"))

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

def _where(cond, x, y):
    """Select that stays in python when everything is constant (lets whole
    constant subexpressions — e.g. ops on the baked b2/two_inv limb
    tuples — fold at trace time)."""
    if isinstance(cond, (bool, np.bool_)):
        return x if cond else y
    return jnp.where(cond, x, y)


class KCtx:
    """Per-modulus constants threaded through the in-kernel formulas.

    Representation: an Fq value inside a kernel is a LIST of N per-limb
    [sub, 128] uint32 arrays — each limb one native vreg stack — with
    sequential carry chains, exactly the spelling of
    pallas_kernels._mont_mul_body (which sustains ~20x the throughput of
    row-sliced [N, sub, 128] arithmetic: strided slice read-modify-writes
    hit a VMEM bandwidth/alignment wall, per scripts/bench_mont.py).
    Field constants are python-int limb tuples, so constant operands fold
    into scalar-vector instructions (and pallas_call needs no constant
    input rows at all)."""

    def __init__(self, mod: L.Mod):
        self.q = tuple(int(x) for x in mod.q_np)
        self.notq = tuple(int(x) for x in mod.notq_np)
        self.qinv = int(mod.qinv)
        self.modulus_int = int(mod.modulus)
        enc = lambda v: tuple(int(x) for x in mod.encode(v % mod.modulus))
        self.two_inv = enc(pow(2, mod.modulus - 2, mod.modulus))
        self.b2 = (enc(C.B2[0]), enc(C.B2[1]))
        self.mont_one = enc(1)

    # -- constants --------------------------------------------------------

    def const_fq(self, int_limbs, like):
        """Materialize an int-limb tuple as arrays shaped like `like`."""
        return [jnp.full_like(like, v) for v in int_limbs]

    def zero_fq(self, like):
        z = jnp.zeros_like(like)
        return [z] * N

    # -- field ops (limb lists in, limb lists out) ------------------------

    def cond_sub(self, limbs):
        """r - q if r >= q, branchless (borrow-free: r + ~q + 1; the
        carry-out of the chain is exactly r >= q)."""
        s = []
        c = None
        for k in range(N):
            v = limbs[k] + self.notq[k] + (1 if c is None else c)
            s.append(v & MASK)
            c = v >> LB
        ge = c > 0
        return [_where(ge, sk, lk) for sk, lk in zip(s, limbs)]

    def add(self, a, b):
        s = []
        c = None
        for k in range(N):
            v = a[k] + b[k] if c is None else a[k] + b[k] + c
            s.append(v & MASK)
            c = v >> LB
        return self.cond_sub(s)

    def sub(self, a, b):
        """a - b mod q via a + q + ~b + 1 (drop the 2^256 wrap)."""
        s = []
        c = None
        for k in range(N):
            nb = (~b[k]) & MASK
            v = a[k] + self.q[k] + nb + (1 if c is None else c)
            s.append(v & MASK)
            c = v >> LB
        return self.cond_sub(s)

    def neg(self, a):
        s = []
        c = None
        for k in range(N):
            na = (~a[k]) & MASK
            v = self.q[k] + na + (1 if c is None else c)
            s.append(v & MASK)
            c = v >> LB
        return self.cond_sub(s)

    def double(self, a):
        return self.add(a, a)

    def mul9(self, a):
        return self.add(self.double(self.double(self.double(a))), a)

    def mul(self, a, b):
        """CIOS Montgomery product (HAC 14.32; reference arith.rs:525-545)
        on limb lists; identical math to pallas_kernels._mont_mul_body /
        limbs.mont_mul.  Column sums stay < 2^23 — no u32 overflow."""
        t = [None] * (2 * N)

        def acc(k, v):
            t[k] = v if t[k] is None else t[k] + v

        for i in range(N):
            ai = a[i]
            for j in range(N):
                p = ai * b[j]
                acc(i + j, p & MASK)
                acc(i + j + 1, p >> LB)
        return self._mont_reduce_tail(t)

    def mul_cios(self, a, b):
        """Interleaved CIOS Montgomery product (same math as mul()): the
        running value t holds N+2 limbs instead of 2N (peak live vregs
        ~36 vs ~64).  Measured on v5e (scripts/bench_mont.py, honest
        chained+transfer timing): 1.89 G/s vs mul()'s 2.06 G/s — register
        pressure is NOT the bottleneck at these sizes, so mul() stays the
        default; this variant is kept as the measured record.  Deferred
        carries: per round t[j] gains 4 sub-2^16 terms, so over N=16
        rounds column sums stay < 2^23 — no u32 overflow, and m_i only
        needs t[0] mod 2^16 which survives deferral."""
        t = [None] * (N + 2)

        def add(k, v):
            t[k] = v if t[k] is None else t[k] + v

        for i in range(N):
            ai = a[i]
            for j in range(N):
                p = ai * b[j]
                add(j, p & MASK)
                add(j + 1, p >> LB)
            m = ((t[0] & MASK) * self.qinv) & MASK
            for j in range(N):
                p = m * self.q[j]
                add(j, p & MASK)
                add(j + 1, p >> LB)
            add(1, t[0] >> LB)
            t = t[1:] + [None]
        limbs = []
        c = None
        for k in range(N):
            v = t[k] if c is None else t[k] + c
            limbs.append(v & MASK)
            c = v >> LB
        return self.cond_sub(limbs)

    # -- lazy-reduction column domain (signed int32 column sums) ----------
    #
    # A Montgomery product splits into a product phase (schoolbook columns,
    # ~half the vinsts) and a reduce phase (~half).  The reduce is LINEAR,
    # so sums/differences of products can share ONE reduce: Fq2 Karatsuba
    # drops from 3 reduces to 2 (c0 = m00 - m11, c1 = cross - m00 - m11,
    # both reduced once).  Columns are signed int32: |col| < 3 * 2^21, and
    # the reduced value lies in (-q, kq) for k = #summed products + 1,
    # fixed up by one conditional +q and the usual conditional -q.
    # int32<->uint32 hops are bitcasts (free on the VPU datapath).

    def product_cols(self, a, b):
        """Schoolbook product columns of two reduced operands -> list of
        2N signed-int32 column sums (each in [0, 2^21))."""
        t = [None] * (2 * N)

        def acc(k, v):
            t[k] = v if t[k] is None else t[k] + v

        for i in range(N):
            ai = a[i]
            for j in range(N):
                p = ai * b[j]
                acc(i + j, (p & MASK).astype(jnp.int32))
                acc(i + j + 1, (p >> LB).astype(jnp.int32))
        return t

    @staticmethod
    def cols_sub(x, y):
        return [a - b for a, b in zip(x, y)]

    @staticmethod
    def cols_add(x, y):
        return [a + b for a, b in zip(x, y)]

    def reduce_cols(self, t):
        """Montgomery-reduce signed column sums -> canonical limbs.

        Value-identical to _mont_reduce_tail on the same integer value
        (mod q); tolerates negative columns (|col| < 2^26) and a result
        value in (-q, 2q)."""
        t = list(t)
        for i in range(N):
            low = (t[i] & MASK).astype(jnp.uint32)      # low 16 bits >= 0
            m = (low * self.qinv) & MASK                 # uint32 math
            for j in range(N):
                p = m * self.q[j]
                t[i + j] = t[i + j] + (p & MASK).astype(jnp.int32)
                t[i + j + 1] = t[i + j + 1] + (p >> LB).astype(jnp.int32)
            t[i + 1] = t[i + 1] + (t[i] >> LB)           # arithmetic shift
        # signed carry-normalize the high half
        limbs = []
        c = None
        for k in range(N):
            v = t[N + k] if c is None else t[N + k] + c
            limbs.append((v & MASK).astype(jnp.uint32))
            c = v >> LB
        neg = c < 0                                      # value in (-q, 0)
        # conditional +q (mod 2^256), then the usual conditional -q
        s = []
        cc = None
        for k in range(N):
            v = limbs[k] + self.q[k] + (0 if cc is None else cc)
            s.append(v & MASK)
            cc = v >> LB
        limbs = [_where(neg, sk, lk) for sk, lk in zip(s, limbs)]
        return self.cond_sub(limbs)

    def reduce_cols_wide(self, t):
        """reduce_cols for |value| < 32q (multi-product lazy sums across
        the whole tower): 17-limb normalize — add the constant 32q, then
        a binary descent of conditional subtracts 64q..q."""
        t = list(t)
        for i in range(N):
            low = (t[i] & MASK).astype(jnp.uint32)
            m = (low * self.qinv) & MASK
            for j in range(N):
                p = m * self.q[j]
                t[i + j] = t[i + j] + (p & MASK).astype(jnp.int32)
                t[i + j + 1] = t[i + j + 1] + (p >> LB).astype(jnp.int32)
            t[i + 1] = t[i + 1] + (t[i] >> LB)
        # 17-limb signed carry-normalize of the high half
        limbs = []
        c = None
        for k in range(N):
            v = t[N + k] if c is None else t[N + k] + c
            limbs.append((v & MASK).astype(jnp.uint32))
            c = v >> LB
        # + 32q (value becomes non-negative, < 64q), carry into limb 16
        off = [(32 * self.modulus_int >> (LB * k)) & MASK
               for k in range(N + 1)]
        cc = None
        out = []
        for k in range(N):
            v = limbs[k] + off[k] + (0 if cc is None else cc)
            out.append(v & MASK)
            cc = v >> LB
        top = (c + off[N] + cc).astype(jnp.uint32)       # limb 16, small
        limbs = out
        # conditional subtract kq for k = 64, 32, ..., 1 over 17 limbs
        for kq in (64, 32, 16, 8, 4, 2, 1):
            sub = [(kq * self.modulus_int >> (LB * k)) & MASK
                   for k in range(N + 1)]
            s = []
            b = None
            for k in range(N):
                v = limbs[k] + ((~sub[k]) & MASK) + (1 if b is None else b)
                s.append(v & MASK)
                b = v >> LB
            vtop = top + ((~sub[N]) & MASK) + b
            stop = vtop & MASK
            ge = (vtop >> LB) > 0                         # no borrow
            limbs = [_where(ge, sk, lk) for sk, lk in zip(s, limbs)]
            top = _where(ge, stop, top)
        return limbs                                      # < q, top == 0

    def sqr(self, a):
        """Montgomery square: off-diagonal products computed once and
        added twice — ~N^2/2 multiplies (value-identical to mul(a, a))."""
        t = [None] * (2 * N)

        def acc(k, v):
            t[k] = v if t[k] is None else t[k] + v

        for i in range(N):
            ai = a[i]
            for j in range(i, N):
                p = ai * a[j]
                lo = p & MASK
                hi = p >> LB
                acc(i + j, lo)
                acc(i + j + 1, hi)
                if j > i:
                    acc(i + j, lo)
                    acc(i + j + 1, hi)
        return self._mont_reduce_tail(t)

    def _mont_reduce_tail(self, t):
        for i in range(N):
            m = (t[i] * self.qinv) & MASK
            for j in range(N):
                p = m * self.q[j]
                t[i + j] = t[i + j] + (p & MASK)
                t[i + j + 1] = t[i + j + 1] + (p >> LB)
            t[i + 1] = t[i + 1] + (t[i] >> LB)
        # carry-normalize the high half
        limbs = []
        c = None
        for k in range(N):
            v = t[N + k] if c is None else t[N + k] + c
            limbs.append(v & MASK)
            c = v >> LB
        return self.cond_sub(limbs)

    def select(self, mask, a, b):
        return [_where(mask, x, y) for x, y in zip(a, b)]

    def is_zero(self, a):
        r = None
        for x in a:
            z = x == 0
            r = z if r is None else (r & z)
        return r

    def eq(self, a, b):
        r = None
        for x, y in zip(a, b):
            z = x == y
            r = z if r is None else (r & z)
        return r


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


# Lazy fq2 reduction: bit-exact vs the eager spelling in interpret mode
# (tests/test_pallas_fused.py) AND Mosaic-validated on hardware —
# scripts/tpu_check.py passed with BN254_LAZY_FQ2=1 on the v5e
# (round 3, 2026-08-19) — so it is the DEFAULT.  Set BN254_LAZY_FQ2=0
# to fall back to the eager spelling.
import os as _os

_LAZY_FQ2 = _os.environ.get("BN254_LAZY_FQ2", "1") not in ("0", "")


def kfq2_mul(K, a, b):
    """Karatsuba; with BN254_LAZY_FQ2=1 the three products stay in the
    signed column domain and each output coefficient reduces ONCE
    (2 Montgomery reduces instead of 3 — the reduce is linear, fq2.rs
    value semantics unchanged)."""
    if _LAZY_FQ2:
        m00 = K.product_cols(a[0], b[0])
        m11 = K.product_cols(a[1], b[1])
        cross = K.product_cols(K.add(a[0], a[1]), K.add(b[0], b[1]))
        c0 = K.reduce_cols(K.cols_sub(m00, m11))
        c1 = K.reduce_cols(K.cols_sub(K.cols_sub(cross, m00), m11))
        return (c0, c1)
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


# --- column-domain fq2 (lazy reduction across whole tower ops) -------------
#
# A ColFq2 is a pair of signed-int32 column lists (unreduced Karatsuba
# outputs).  All the tower's LINEAR combining (add/sub/xi/nonresidue)
# happens here; only the final output coefficients Montgomery-reduce
# (reduce_cols_wide).  Bounds: products contribute columns < 3*2^21;
# the worst combination below (fq12 Karatsuba over Devegili fq6 with one
# xi scaling) keeps |col| < 2^28 and |value| < 32q — inside int32 and
# inside reduce_cols_wide's normalize window.

def c2_prod(K, a, b):
    m00 = K.product_cols(a[0], b[0])
    m11 = K.product_cols(a[1], b[1])
    cross = K.product_cols(K.add(a[0], a[1]), K.add(b[0], b[1]))
    return (K.cols_sub(m00, m11),
            K.cols_sub(K.cols_sub(cross, m00), m11))


def c2_add(x, y):
    return (KCtx.cols_add(x[0], y[0]), KCtx.cols_add(x[1], y[1]))


def c2_sub(x, y):
    return (KCtx.cols_sub(x[0], y[0]), KCtx.cols_sub(x[1], y[1]))


def c2_xi(x):
    # (9 + i) * (c0 + c1 i) = (9c0 - c1) + (9c1 + c0) i, on columns
    return ([9 * a - b for a, b in zip(x[0], x[1])],
            [9 * a + b for a, b in zip(x[1], x[0])])


def c2_reduce(K, x):
    return (K.reduce_cols_wide(x[0]), K.reduce_cols_wide(x[1]))


def c6_prod(K, a, b):
    """Devegili fq6 mul with every output kept in the column domain."""
    a_a = c2_prod(K, a[0], b[0])
    b_b = c2_prod(K, a[1], b[1])
    c_c = c2_prod(K, a[2], b[2])
    cross_bc = c2_prod(K, kfq2_add(K, a[1], a[2]), kfq2_add(K, b[1], b[2]))
    cross_ab = c2_prod(K, kfq2_add(K, a[0], a[1]), kfq2_add(K, b[0], b[1]))
    cross_ac = c2_prod(K, kfq2_add(K, a[0], a[2]), kfq2_add(K, b[0], b[2]))
    c0 = c2_add(c2_xi(c2_sub(c2_sub(cross_bc, b_b), c_c)), a_a)
    c1 = c2_add(c2_sub(c2_sub(cross_ab, a_a), b_b), c2_xi(c_c))
    c2v = c2_sub(c2_add(c2_sub(cross_ac, a_a), b_b), c_c)
    return (c0, c1, c2v)


def c6_add(x, y):
    return tuple(c2_add(a, b) for a, b in zip(x, y))


def c6_sub(x, y):
    return tuple(c2_sub(a, b) for a, b in zip(x, y))


def c6_nonres(x):
    return (c2_xi(x[2]), x[0], x[1])


def kfq6_add(K, a, b):
    return tuple(kfq2_add(K, x, y) for x, y in zip(a, b))


def kfq6_sub(K, a, b):
    return tuple(kfq2_sub(K, x, y) for x, y in zip(a, b))


def kfq6_neg(K, a):
    return tuple(kfq2_neg(K, x) for x in a)


def kfq6_mul_by_nonresidue(K, a):
    return (kfq2_mul_by_xi(K, a[2]), a[0], a[1])


def kfq6_mul(K, a, b):
    if _LAZY_FQ2:
        return tuple(c2_reduce(K, c) for c in c6_prod(K, a, b))
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
    # With _LAZY_FQ2, laziness lives INSIDE the three kfq6_mul calls
    # (18 reduces instead of 54); carrying their outputs onward in the
    # column domain would apply xi twice, pushing |value| past the
    # +-32q normalize window and |column| past int32 on adversarial
    # operands — so the fq12-level combine stays in the value domain.
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


def _kfq12_mul_by_024_lazy(K, a, x0, x2, x4):
    """mul_by_024 with all 13 fq2 products in the column domain and one
    Montgomery reduce per output coefficient (same algebra as the eager
    spelling below, term for term)."""
    (z0, z1, z2), (z3, z4, z5) = a

    d0 = c2_prod(K, z0, x0)
    d2 = c2_prod(K, z2, x2)
    d4 = c2_prod(K, z4, x4)

    p_z1x2 = c2_prod(K, z1, x2)
    nz0 = c2_add(c2_xi(c2_add(p_z1x2, d4)), d0)

    p_z5x4 = c2_prod(K, z5, x4)
    p_z1x0 = c2_prod(K, z1, x0)
    nz1 = c2_add(c2_xi(c2_add(p_z5x4, d2)), p_z1x0)
    s1 = c2_add(c2_add(p_z1x2, p_z5x4), p_z1x0)

    p_t1t0 = c2_prod(K, kfq2_add(K, z0, z2), kfq2_add(K, x0, x2))
    p_z3x4 = c2_prod(K, z3, x4)
    nz2 = c2_add(c2_sub(c2_sub(p_t1t0, d0), d2), p_z3x4)
    s1 = c2_add(s1, p_z3x4)

    p_t0t1 = c2_prod(K, kfq2_add(K, z2, z4), kfq2_add(K, x2, x4))
    p_z3x0 = c2_prod(K, z3, x0)
    nz3 = c2_add(c2_xi(c2_sub(c2_sub(p_t0t1, d2), d4)), p_z3x0)
    s1 = c2_add(s1, p_z3x0)

    p_z5x2 = c2_prod(K, z5, x2)
    s1 = c2_add(s1, p_z5x2)
    p_t2t0 = c2_prod(K, kfq2_add(K, z0, z4), kfq2_add(K, x0, x4))
    nz4 = c2_add(c2_xi(p_z5x2), c2_sub(c2_sub(p_t2t0, d0), d4))

    s0 = kfq2_add(K, kfq2_add(K, z1, z3), z5)
    p_s0t0 = c2_prod(K, s0, kfq2_add(K, kfq2_add(K, x0, x2), x4))
    nz5 = c2_sub(p_s0t0, s1)

    red = lambda c: c2_reduce(K, c)
    return ((red(nz0), red(nz1), red(nz2)),
            (red(nz3), red(nz4), red(nz5)))


def kfq12_mul_by_024(K, a, x0, x2, x4):
    if _LAZY_FQ2:
        return _kfq12_mul_by_024_lazy(K, a, x0, x2, x4)
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
        return _fq_of(ref, c)

    @staticmethod
    def write(ref, c, v):
        _store_fq(ref, c, v)

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
        return _fq2_of(ref, c)

    @staticmethod
    def write(ref, c, v):
        _write_fq2(ref, c, v)

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


def k_point_madd(K, A, p, q):
    """Unified branchless MIXED add: p Jacobian + q affine (z2 = 1),
    madd-2007-bl shape — 8M+3S vs the full add's 11M+5S, and the
    coincide branch doubles the AFFINE representative (1M+5S vs 2M+5S).

    The result is the same group element as k_point_add(p, (qx, qy, 1))
    but may differ in Jacobian representative on the coincide branch —
    callers must compare projectively (MSM buckets qualify; outputs are
    normalized/compared via to_affine/eq_points).  q MUST be finite:
    infinity inputs are handled upstream (MSM's discard bucket)."""
    qx, qy = q
    p_inf = A.is_zero(K, p[2])

    z1s = A.sqr(K, p[2])
    u2 = A.mul(K, qx, z1s)
    s2 = A.mul(K, qy, A.mul(K, p[2], z1s))

    coincide = A.eq(K, p[0], u2) & A.eq(K, p[1], s2) & ~p_inf

    h = A.sub(K, u2, p[0])
    d = A.sub(K, s2, p[1])
    rr = A.add(K, d, d)
    i = A.sqr(K, A.add(K, h, h))
    j = A.mul(K, h, i)
    v = A.mul(K, p[0], i)
    s1j = A.mul(K, p[1], j)
    x3 = A.sub(K, A.sub(K, A.sqr(K, rr), j), A.add(K, v, v))
    y3 = A.sub(K, A.mul(K, rr, A.sub(K, v, x3)), A.add(K, s1j, s1j))
    zh = A.mul(K, p[2], h)
    generic = (x3, y3, A.add(K, zh, zh))     # h == 0 (p == -q) -> infinity

    # affine doubling of q (any representative of 2p works projectively)
    a = A.sqr(K, qx)
    b = A.sqr(K, qy)
    c = A.sqr(K, b)
    d2 = A.sub(K, A.sub(K, A.sqr(K, A.add(K, qx, b)), a), c)
    d2 = A.add(K, d2, d2)
    e = A.add(K, A.add(K, a, a), a)
    f = A.sqr(K, e)
    xd = A.sub(K, f, A.add(K, d2, d2))
    c8 = A.add(K, c, c)
    c8 = A.add(K, c8, c8)
    c8 = A.add(K, c8, c8)
    dbl = (xd, A.sub(K, A.mul(K, e, A.sub(K, d2, xd)), c8),
           A.add(K, qy, qy))

    one = K.const_fq(K.mont_one, jax.tree.leaves(qx)[0])
    zero = K.zero_fq(jax.tree.leaves(qx)[0])
    if A.COORDS == 1:
        q_jac = (qx, qy, one)
    else:
        q_jac = (qx, qy, (one, zero))

    out = tuple(A.select(K, coincide, x, y) for x, y in zip(dbl, generic))
    return tuple(A.select(K, p_inf, x, y) for x, y in zip(q_jac, out))


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


# In-kernel ref I/O: refs are [C, N, sub, 128]; a loaded Fq value is a
# LIST of N per-limb [sub, 128] arrays (see KCtx docstring).

def _fq_of(ref, c):
    return [ref[c, i] for i in range(N)]


def _store_fq(ref, c, v):
    for i in range(N):
        ref[c, i] = v[i]


def _fq2_of(ref, c):
    return (_fq_of(ref, c), _fq_of(ref, c + 1))


def _write_fq2(ref, c, v):
    _store_fq(ref, c, v[0])
    _store_fq(ref, c + 1, v[1])


def _read_fq12(ref):
    return ((_fq2_of(ref, 0), _fq2_of(ref, 2), _fq2_of(ref, 4)),
            (_fq2_of(ref, 6), _fq2_of(ref, 8), _fq2_of(ref, 10)))


def _write_fq12(ref, v):
    (c00, c01, c02), (c10, c11, c12) = v
    for i, fq2v in enumerate((c00, c01, c02, c10, c11, c12)):
        _write_fq2(ref, 2 * i, fq2v)


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
        ins = refs[:len(in_coords)]
        outs = refs[len(in_coords):len(in_coords) + len(out_coords)]
        K = KCtx(mod)
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
            px = _fq_of(ins[2], 0)
            py = _fq_of(ins[3], 0)
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
        return pl.pallas_call(
            kernel,
            out_shape=tuple(jax.ShapeDtypeStruct(_shape3(c, batch),
                                                 jnp.uint32)
                            for c in out_coords),
            grid=(grid,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            interpret=interpret,
        )

    call = build(batch)

    def run(*arrs):
        ins = [_to3(a, c, batch) for a, c in zip(arrs, in_coords)]
        outs = call(*ins)
        outs = tuple(_from3(o, c, batch)
                     for o, c in zip(outs, out_coords))
        return outs if len(outs) > 1 else outs[0]

    return run


def kg2_dbl_step(K, r):
    """Miller doubling step (groups/mod.rs:754-776) on a G2 Jacobian
    triple of fq2 pairs; returns (new point, (ell_0, ell_vw, ell_vv))."""
    x, y, z = r
    two_inv = K.two_inv                  # int-limb tuple: folds to scalars
    b2c = K.b2

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
    return (nx, ny, nz), (ell_0, ell_vw, ell_vv)


def kg2_add_step(K, r, base):
    """Mixed addition step (groups/mod.rs:731-752) vs an affine base."""
    x, y, z = r
    bx, by = base

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
    return (nx, ny, nz), (ell_0, ell_vw, ell_vv)


def _read_g2_triple(ref):
    return (_fq2_of(ref, 0), _fq2_of(ref, 2), _fq2_of(ref, 4))


def _write_g2_triple(ref, v):
    _write_fq2(ref, 0, v[0])
    _write_fq2(ref, 2, v[1])
    _write_fq2(ref, 4, v[2])


def _g2_dbl_step_kernel(K, ins, outs):
    nr, coeffs = kg2_dbl_step(K, _read_g2_triple(ins[0]))
    _write_g2_triple(outs[0], nr)
    _write_g2_triple(outs[1], coeffs)


def _g2_add_step_kernel(K, ins, outs):
    base = (_fq2_of(ins[1], 0), _fq2_of(ins[1], 2))
    nr, coeffs = kg2_add_step(K, _read_g2_triple(ins[0]), base)
    _write_g2_triple(outs[0], nr)
    _write_g2_triple(outs[1], coeffs)


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
# sequential kernel launches from a lax.scan.  Exponent digits arrive as an
# SMEM input (MSB-first, leading digit dropped; res starts at the base) and
# the multiply runs ONLY on nonzero digits via pl.when — a 0 digit costs a
# squaring, nothing more (q-2 has 110/254 set bits; z has 28/63 binary,
# 24/63 NAF).  Digit 2 multiplies by the conjugate (the free cyclotomic
# inverse), used by the NAF ladder on unitary inputs.
#
# (Karabina compressed squaring was evaluated and rejected for this path:
# decompression needs a field inversion, which on the branchless device
# path is a 254-step Fermat ladder — costlier than the 6-mul-per-squaring
# saving across a 62-step ladder.)
# ---------------------------------------------------------------------------

def _pow_call(which: str, batch: int, ndigits: int, tile_s: int = _TILE_S):
    return _pow_call_impl(which, batch, ndigits, tile_s, _INTERPRET)


def kfq12_conj(K, a):
    """Unitary inverse (fq12.rs:126): conjugation over Fq6."""
    return (a[0], kfq6_neg(K, a[1]))


@functools.lru_cache(maxsize=None)
def _pow_call_impl(which: str, batch: int, ndigits: int, tile_s: int,
                   interpret: bool):
    mod = _fq_mod()
    coords = {"fq_pow": 1, "fq12_cyc_pow": 12}[which]

    def kernel(digits_ref, a_ref, out_ref):
        K = KCtx(mod)
        if which == "fq_pow":
            _store_fq(out_ref, 0, _fq_of(a_ref, 0))

            def body(i, carry):
                _store_fq(out_ref, 0, K.sqr(_fq_of(out_ref, 0)))

                @pl.when(digits_ref[i, 0] > 0)
                def _mul():
                    _store_fq(out_ref, 0,
                              K.mul(_fq_of(out_ref, 0), _fq_of(a_ref, 0)))

                return carry

            jax.lax.fori_loop(0, ndigits, body, 0)
        else:
            a = _read_fq12(a_ref)
            aconj = kfq12_conj(K, a)
            _write_fq12(out_ref, a)

            def body(i, carry):
                _write_fq12(out_ref,
                            kfq12_cyclotomic_sqr(K, _read_fq12(out_ref)))
                d = digits_ref[i, 0]

                @pl.when(d > 0)
                def _mul():
                    m = jax.tree.map(
                        lambda x, y: jnp.where(d == 1, x, y), a, aconj)
                    _write_fq12(out_ref,
                                kfq12_mul(K, _read_fq12(out_ref), m))

                return carry

            jax.lax.fori_loop(0, ndigits, body, 0)

    sub = tile_s
    while batch % (sub * 128) and sub > 1:
        sub //= 2
    grid = batch // (sub * 128)
    ms = pltpu.ANY if interpret else pltpu.VMEM
    bits_spec = pl.BlockSpec((ndigits, 1), lambda i: (0, 0),
                             memory_space=pltpu.ANY if interpret
                             else pltpu.SMEM)
    a_spec = pl.BlockSpec((coords, N, sub, 128), lambda i: (0, 0, i, 0),
                          memory_space=ms)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(_shape3(coords, batch), jnp.uint32),
        grid=(grid,),
        in_specs=[bits_spec, a_spec],
        out_specs=a_spec,
        interpret=interpret,
    )

    def run(a_packed, bits_np):
        return _from3(call(jnp.asarray(bits_np),
                           _to3(a_packed, coords, batch)), coords, batch)

    return run


def _msb_bits(e: int) -> np.ndarray:
    """MSB-first bits of e with the leading 1 dropped -> [nbits, 1] i32."""
    nb = e.bit_length()
    return np.array([[(e >> i) & 1] for i in range(nb - 2, -1, -1)],
                    dtype=np.int32)


def _naf_digits(e: int) -> np.ndarray:
    """MSB-first NAF digits of e, leading 1 dropped -> [n, 1] i32 with
    values {0, 1, 2}; 2 encodes -1 (multiply by the conjugate)."""
    d = []
    while e:
        if e & 1:
            w = 2 - (e % 4)           # 1 or -1
            d.append(w)
            e -= w
        else:
            d.append(0)
        e >>= 1
    assert d[-1] == 1
    return np.array([[x if x >= 0 else 2] for x in reversed(d[:-1])],
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
    ladder kernel: 62 cyclotomic squarings; the 27 multiplies of z's
    binary expansion run under pl.when (zero digits cost a squaring
    only).  Formula-pinned: valid for arbitrary Fq12 input, exactly like
    the reference's cyclotomic_pow."""
    batch = a[0][0][0].shape[1]
    bits = _msb_bits(C.Z)
    return unpack_fq12(
        _pow_call("fq12_cyc_pow", batch, len(bits))(pack(a), bits))


def fq12_cyclotomic_pow_z_unitary(a):
    """a^z for a in the cyclotomic subgroup G_phi6(q^2) = {a :
    a^(q^4-q^2+1) = 1} — where Granger-Scott cyclotomic squaring is a
    true square AND conjugation is the inverse.  Every exp_by_neg_z
    input inside the final exponentiation qualifies (the easy chunk maps
    onto x^((q^6-1)(q^2+1))).  NAF ladder: 62 squarings + 23 multiplies
    (vs 27 for binary).  Bit-identical to fq12_cyclotomic_pow_z there;
    NOT valid for arbitrary elements (mere unitarity conj(a)*a == 1 is
    not sufficient either)."""
    batch = a[0][0][0].shape[1]
    digits = _naf_digits(C.Z)
    return unpack_fq12(
        _pow_call("fq12_cyc_pow", batch, len(digits))(pack(a), digits))


# ---------------------------------------------------------------------------
# Whole-Miller-loop kernel: the G2 precompute (doubling/addition line
# steps, groups/mod.rs:701-776) interleaved with the Miller fold
# (mod.rs:580-606) — all 85 scheduled steps in ONE kernel.  vs the
# scan-of-kernels spelling this (a) runs dbl OR add per step instead of
# both + select, (b) squares f only on doubling steps, and (c) keeps f,
# r and the line coeffs in VMEM for the whole loop instead of ~87 HBM
# round-trips.  The 2 Frobenius addition steps (mod.rs:717-721) run
# outside (they need the twist constants).  Bit-exact: same formula
# sequence as pairing_jax.precompute + miller_loop.
# ---------------------------------------------------------------------------

def _miller_call(batch: int, nsteps: int, tile_s: int = _TILE_S):
    return _miller_call_impl(batch, nsteps, tile_s, _INTERPRET)


@functools.lru_cache(maxsize=None)
def _miller_call_impl(batch: int, nsteps: int, tile_s: int,
                      interpret: bool):
    mod = _fq_mod()

    def kernel(kinds_ref, p_ref, q_ref, f_ref, r_ref, c_ref):
        K = KCtx(mod)
        px = _fq_of(p_ref, 0)
        py = _fq_of(p_ref, 1)
        qx = _fq2_of(q_ref, 0)
        qy = _fq2_of(q_ref, 2)
        qy_neg = kfq2_neg(K, qy)
        one = K.const_fq(K.mont_one, px[0])
        zero = K.zero_fq(px[0])

        _write_g2_triple(r_ref, (qx, qy, (one, zero)))
        _write_fq12(f_ref, (((one, zero), (zero, zero), (zero, zero)),
                            ((zero, zero), (zero, zero), (zero, zero))))

        def body(i, carry):
            kind = kinds_ref[i, 0]

            @pl.when(kind == 0)
            def _dbl():
                _write_fq12(f_ref, kfq12_sqr(K, _read_fq12(f_ref)))
                nr, coeffs = kg2_dbl_step(K, _read_g2_triple(r_ref))
                _write_g2_triple(r_ref, nr)
                _write_g2_triple(c_ref, coeffs)

            @pl.when(kind > 0)
            def _add():
                by = jax.tree.map(
                    lambda a, b: jnp.where(kind == 1, a, b), qy, qy_neg)
                nr, coeffs = kg2_add_step(K, _read_g2_triple(r_ref),
                                          (qx, by))
                _write_g2_triple(r_ref, nr)
                _write_g2_triple(c_ref, coeffs)

            ell_0, ell_vw, ell_vv = _read_g2_triple(c_ref)
            x2 = kfq2_scale(K, ell_vv, px)
            x4 = kfq2_scale(K, ell_vw, py)
            _write_fq12(f_ref, kfq12_mul_by_024(K, _read_fq12(f_ref),
                                                ell_0, x2, x4))
            return carry

        jax.lax.fori_loop(0, nsteps, body, 0)

    sub = tile_s
    while batch % (sub * 128) and sub > 1:
        sub //= 2
    grid = batch // (sub * 128)
    ms = pltpu.ANY if interpret else pltpu.VMEM
    kinds_spec = pl.BlockSpec((nsteps, 1), lambda i: (0, 0),
                              memory_space=pltpu.ANY if interpret
                              else pltpu.SMEM)
    spec = lambda c: pl.BlockSpec((c, N, sub, 128),
                                  lambda i: (0, 0, i, 0), memory_space=ms)
    call = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(_shape3(12, batch), jnp.uint32),
                   jax.ShapeDtypeStruct(_shape3(6, batch), jnp.uint32)),
        grid=(grid,),
        in_specs=[kinds_spec, spec(2), spec(4)],
        out_specs=(spec(12), spec(6)),
        scratch_shapes=[pltpu.VMEM((6, N, sub, 128), jnp.uint32)],
        interpret=interpret,
    )

    def run(p_packed, q_packed, kinds_np):
        f, r = call(jnp.asarray(kinds_np),
                    _to3(p_packed, 2, batch), _to3(q_packed, 4, batch))
        return _from3(f, 12, batch), _from3(r, 6, batch)

    return run


def miller_precompute(q_affine, p_affine, kinds_np):
    """Fused precompute+Miller over the scheduled (non-Frobenius) steps.

    q_affine: fq2 affine pair ((x0,x1),(y0,y1)); p_affine: (px, py) Fq
    batches; kinds_np: [nsteps, 1] int32 (0 dbl, 1 add Q, 2 add -Q).
    Returns (f fq12 pytree, r Jacobian G2 triple)."""
    batch = p_affine[0].shape[1]
    f, r = _miller_call(batch, len(kinds_np))(
        pack(p_affine), pack(q_affine), kinds_np)
    return unpack_fq12(f), _unpack_g2(r)


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


# ---------------------------------------------------------------------------
# Pippenger bucket accumulation (MSM hot loop)
# ---------------------------------------------------------------------------
#
# Round-1/2 profiling (scripts/bench_msm.py): XLA lowers the per-step
# random bucket access to ONE DMA PER ROW regardless of layout — 94% of
# MSM wall time.  Fix: keep one window's whole bucket block resident in
# VMEM inside a single kernel and do the "random" access as a one-hot
# select sweep over the (static) bucket index — 2*(2^c)*rows selects per
# step, all static VMEM addressing, zero HBM traffic.
#
# Grid is (W windows, m point-tiles); the scratch bucket block persists
# across the inner m sweep (TPU grid is sequential), is zeroed at i == 0,
# and at i == m-1 collapses in-kernel through the classic running-sum
# (sum_b b*B_b) so only ONE Jacobian point per window leaves the kernel.
# Points stream through a double-buffered BlockSpec (re-read once per
# window: W * n * 192B over HBM, ~10 ms at 2^20 — noise).  Each lane of
# the [sub, 128] tile is an independent Pippenger sub-problem; the jnp
# glue (msm.py) Horner-combines windows and tree-folds lanes.


def _read_pt(ref, A, base):
    c = A.COORDS
    return (A.read(ref, base), A.read(ref, base + c),
            A.read(ref, base + 2 * c))


def _write_pt(ref, A, base, v):
    c = A.COORDS
    A.write(ref, base, v[0])
    A.write(ref, base + c, v[1])
    A.write(ref, base + 2 * c, v[2])


def _sel_pt(K, A, mask, a, b):
    return tuple(A.select(K, mask, x, y) for x, y in zip(a, b))


def k_point_madd_generic(K, A, p, q):
    """The generic + infinity branches of k_point_madd WITHOUT the
    affine-doubling branch: returns (out, coincide) where lanes with
    coincide=True hold an incorrect value (z3 == 0) and must be patched
    by the caller (msm kernel: a pl.when-gated affine double — the
    coincide case needs duplicate points in one bucket, rare in real
    workloads, so its 1M+5S cost should not be paid unconditionally)."""
    qx, qy = q
    p_inf = A.is_zero(K, p[2])

    z1s = A.sqr(K, p[2])
    u2 = A.mul(K, qx, z1s)
    s2 = A.mul(K, qy, A.mul(K, p[2], z1s))

    coincide = A.eq(K, p[0], u2) & A.eq(K, p[1], s2) & ~p_inf

    h = A.sub(K, u2, p[0])
    d = A.sub(K, s2, p[1])
    rr = A.add(K, d, d)
    i = A.sqr(K, A.add(K, h, h))
    j = A.mul(K, h, i)
    v = A.mul(K, p[0], i)
    s1j = A.mul(K, p[1], j)
    x3 = A.sub(K, A.sub(K, A.sqr(K, rr), j), A.add(K, v, v))
    y3 = A.sub(K, A.mul(K, rr, A.sub(K, v, x3)), A.add(K, s1j, s1j))
    zh = A.mul(K, p[2], h)
    generic = (x3, y3, A.add(K, zh, zh))

    one = K.const_fq(K.mont_one, jax.tree.leaves(qx)[0])
    zero = K.zero_fq(jax.tree.leaves(qx)[0])
    q_jac = (qx, qy, one if A.COORDS == 1 else (one, zero))

    out = tuple(A.select(K, p_inf, x, y) for x, y in zip(q_jac, generic))
    return out, coincide & ~p_inf


def k_affine_double(K, A, q):
    """Jacobian double of an affine point (z = 1) — the madd coincide
    branch (any representative of 2q works projectively)."""
    qx, qy = q
    a = A.sqr(K, qx)
    b = A.sqr(K, qy)
    c = A.sqr(K, b)
    d2 = A.sub(K, A.sub(K, A.sqr(K, A.add(K, qx, b)), a), c)
    d2 = A.add(K, d2, d2)
    e = A.add(K, A.add(K, a, a), a)
    f = A.sqr(K, e)
    xd = A.sub(K, f, A.add(K, d2, d2))
    c8 = A.add(K, c, c)
    c8 = A.add(K, c8, c8)
    c8 = A.add(K, c8, c8)
    return (xd, A.sub(K, A.mul(K, e, A.sub(K, d2, xd)), c8),
            A.add(K, qy, qy))


def msm_accumulate(K_group_coords: int, points_packed, digits, nb: int,
                   signed: bool = False):
    """Bucket-accumulate + reduce all windows of a Pippenger MSM.

    points_packed: [2*ncoords, N, n] uint32 (AFFINE x,y, batch last —
    batch-inverted upstream; the accumulation add is the mixed
    madd-2007-bl, ~1.4x fewer muls than the full Jacobian add);
    digits: [W, n] int32; nb = bucket count incl. the discard bucket 0
    (masked-out/infinity/padding points must carry digit 0, so the
    kernel only ever adds finite affine points).

    signed=False: digits in [0, nb) — classic 2^c buckets.
    signed=True: digits in (-nb, nb) — signed-digit Pippenger; the
    bucket index is |d| and the point's y is negated on d < 0 inside
    the kernel.  Halves the bucket rows AND the one-hot select sweep
    for the same window width (nb = 2^(c-1) + 1 buckets for c-bit
    windows with digits in [-2^(c-1), 2^(c-1)]).

    Returns [W, 3*ncoords, N, lanes] window totals (lanes = tile lanes;
    each lane an independent partial; fold lanes then Horner windows).
    """
    ncoords = K_group_coords
    C2 = 2 * ncoords
    C3 = 3 * ncoords
    W, n = digits.shape
    sub = _TILE_S
    lanes = sub * 128
    assert n % lanes == 0, "pad the point batch to a multiple of sub*128"
    m = n // lanes
    call = _msm_acc_impl(m, W, nb, ncoords, sub, signed, _INTERPRET)
    p4 = points_packed.reshape(C2, N, m * sub, 128)
    d3 = digits.reshape(W, m * sub, 128)
    out = call(d3, p4)                      # [W*C3, N, sub, 128]
    return out.reshape(W, C3, N, lanes)


@functools.lru_cache(maxsize=None)
def _msm_acc_impl(m: int, W: int, nb: int, ncoords: int, sub: int,
                  signed: bool, interpret: bool):
    mod = _fq_mod()
    A = FqA if ncoords == 1 else Fq2A
    C3 = 3 * ncoords
    rows = (nb - 1) * C3                    # bucket 0 is never stored

    def kernel(d_ref, p_ref, out_ref, bk_ref, new_ref):
        K = KCtx(mod)
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _init():
            bk_ref[...] = jnp.zeros((rows, N, sub, 128), jnp.uint32)

        d = d_ref[0]                        # [sub, 128] int32
        qx = A.read(p_ref, 0)
        qy = A.read(p_ref, A.COORDS)
        if signed:
            neg = d < 0
            d = jnp.where(neg, -d, d)
            qy = A.select(K, neg, A.neg(K, qy), qy)
        zfq = K.zero_fq(p_ref[0, 0])
        zc = zfq if ncoords == 1 else (zfq, zfq)
        zero_pt = (zc, zc, zc)

        # one-hot gather: cur = buckets[d]  (d == 0 -> infinity)
        cur = zero_pt
        for b in range(1, nb):
            mask = d == b
            bb = _read_pt(bk_ref, A, (b - 1) * C3)
            cur = _sel_pt(K, A, mask, bb, cur)

        new, coincide = k_point_madd_generic(K, A, cur, (qx, qy))
        _write_pt(new_ref, A, 0, new)

        # rare-path patch: duplicate point meets its own bucket value.
        # Gated on ANY lane coinciding so the 1M+5S affine double is
        # normally skipped (bit-exact: same dbl as k_point_madd).
        @pl.when(jnp.any(coincide))
        def _patch():
            dbl = k_affine_double(K, A, (qx, qy))
            cur2 = _read_pt(new_ref, A, 0)
            _write_pt(new_ref, A, 0, _sel_pt(K, A, coincide, dbl, cur2))

        new = _read_pt(new_ref, A, 0)

        # one-hot scatter-back (digit-0 lanes write nothing)
        for b in range(1, nb):
            mask = d == b
            old = _read_pt(bk_ref, A, (b - 1) * C3)
            _write_pt(bk_ref, A, (b - 1) * C3,
                      _sel_pt(K, A, mask, new, old))

        @pl.when(i == m - 1)
        def _reduce():
            # running sum: total = sum_b b * B_b, b = nb-1 .. 1
            def body(j, carry):
                acc, tot = carry
                base = (nb - 2 - j) * C3    # bucket b=nb-1-j is row (b-1)
                bb = _read_pt(bk_ref, A, base)
                acc = k_point_add(K, A, acc, bb)
                tot = k_point_add(K, A, tot, acc)
                return acc, tot

            acc, tot = jax.lax.fori_loop(0, nb - 1, body,
                                         (zero_pt, zero_pt))
            _write_pt(out_ref, A, 0, tot)

    C2 = 2 * ncoords
    d_spec = pl.BlockSpec((1, sub, 128), lambda w, i: (w, i, 0),
                          memory_space=pltpu.ANY if interpret
                          else pltpu.VMEM)
    ms = pltpu.ANY if interpret else pltpu.VMEM
    p_spec = pl.BlockSpec((C2, N, sub, 128), lambda w, i: (0, 0, i, 0),
                          memory_space=ms)
    o_spec = pl.BlockSpec((C3, N, sub, 128), lambda w, i: (w, 0, 0, 0),
                          memory_space=ms)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((W * C3, N, sub, 128), jnp.uint32),
        grid=(W, m),
        in_specs=[d_spec, p_spec],
        out_specs=o_spec,
        scratch_shapes=[pltpu.VMEM((rows, N, sub, 128), jnp.uint32),
                        pltpu.VMEM((C3, N, sub, 128), jnp.uint32)],
        interpret=interpret,
    )

    def run(d3, p4):
        return call(d3, p4)

    return run


# ---------------------------------------------------------------------------
# Whole-ladder GLV scalar multiplication kernel
# ---------------------------------------------------------------------------
#
# The scan-of-kernels GLV ladder (glv.scalar_mul_glv) pays one kernel
# launch + one HBM round-trip of the whole point batch per step — 128
# steps x ~4 point-sized arrays.  This kernel runs the ENTIRE joint
# Strauss-Shamir ladder inside one pallas_call: res, the 3 table points
# and the per-lane digit planes stay VMEM-resident for all 128 steps.
# Same formulas as groups.double/add (k_point_double / k_point_add), so
# the result is bit-identical to the scan spelling, Jacobian
# representative included.


def glv_ladder(group_coords: int, pts_packed, digits):
    """Joint GLV ladder over precomputed table points, one fused kernel.

    pts_packed: [9*ncoords, N, B] uint32 — p1 | p2 | p12 Jacobian point
    batches (signs already applied); digits: [nsteps, B] int32 in
    {0,1,2,3} = bit(k1) + 2*bit(k2), MSB-first.  Returns the
    [3*ncoords, N, B] Jacobian result (res starts at infinity).
    """
    ncoords = group_coords
    batch = pts_packed.shape[-1]
    nsteps = digits.shape[0]
    call = _glv_call_impl(batch, nsteps, ncoords, _TILE_S, _INTERPRET)
    return call(pts_packed, digits)


@functools.lru_cache(maxsize=None)
def _glv_call_impl(batch: int, nsteps: int, ncoords: int, tile_s: int,
                   interpret: bool):
    mod = _fq_mod()
    A = FqA if ncoords == 1 else Fq2A
    C3 = 3 * ncoords
    C9 = 9 * ncoords

    def kernel(d_ref, pts_ref, out_ref):
        K = KCtx(mod)
        p1 = _read_pt(pts_ref, A, 0)
        p2 = _read_pt(pts_ref, A, C3)
        p12 = _read_pt(pts_ref, A, 2 * C3)
        zfq = K.zero_fq(pts_ref[0, 0])
        zc = zfq if ncoords == 1 else (zfq, zfq)
        inf = (zc, zc, zc)
        _write_pt(out_ref, A, 0, inf)

        def body(i, carry):
            res = k_point_double(K, A, _read_pt(out_ref, A, 0))
            d = d_ref[i]                     # [sub, 128] int32
            b1 = (d & 1) > 0
            hi = _sel_pt(K, A, b1, p12, p2)  # b2 == 1
            lo = _sel_pt(K, A, b1, p1, inf)  # b2 == 0
            t = _sel_pt(K, A, d >= 2, hi, lo)
            _write_pt(out_ref, A, 0, k_point_add(K, A, res, t))
            return carry

        jax.lax.fori_loop(0, nsteps, body, 0)

    sub = tile_s
    while batch % (sub * 128) and sub > 1:
        sub //= 2
    grid = batch // (sub * 128)
    ms = pltpu.ANY if interpret else pltpu.VMEM
    d_spec = pl.BlockSpec((nsteps, sub, 128), lambda i: (0, i, 0),
                          memory_space=ms)
    pts_spec = pl.BlockSpec((C9, N, sub, 128), lambda i: (0, 0, i, 0),
                            memory_space=ms)
    out_spec = pl.BlockSpec((C3, N, sub, 128), lambda i: (0, 0, i, 0),
                            memory_space=ms)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(_shape3(C3, batch), jnp.uint32),
        grid=(grid,),
        in_specs=[d_spec, pts_spec],
        out_specs=out_spec,
        interpret=interpret,
    )

    def run(pts_packed, digits):
        d3 = digits.reshape(nsteps, batch // 128, 128)
        return _from3(call(d3, _to3(pts_packed, C9, batch)), C3, batch)

    return run


def available() -> bool:
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return "tpu" in plat or "axon" in plat
