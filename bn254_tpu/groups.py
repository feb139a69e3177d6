"""Batched device group law for G1 (over Fq) and G2 (over Fq2)
(SURVEY.md C7/C8; reference /root/reference/src/groups/mod.rs).

A point batch is a Jacobian triple (x, y, z) of base-field batches; the base
field is abstracted by a small op-table class (DevFq / DevFq2), mirroring
the reference's generic G<P: GroupParams> (mod.rs:34-50).

The group law is fully branchless: the reference's three behavioral
branches in add (is_zero early-outs mod.rs:298-303, equal-point -> double
:315-316) become a 3-way masked select, and the mixed-coordinate identity
(0:1:0) semantics are carried purely by the z == 0 predicate, exactly as in
the reference (zero at mod.rs:229-236 sets z = 0 and equality/affinity only
test z).  The select-based unified add agrees with the reference on all of
{P+inf, inf+Q, P+P, P+(-P), generic} — asserted in tests.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import limbs as L
from . import tower as T
from .fields import FQ, FR
from .spec import constants as C


# ---------------------------------------------------------------------------
# Base-field op tables
# ---------------------------------------------------------------------------

class DevFq:
    """Fq ops in the shape the generic group law wants."""
    add = staticmethod(FQ.add)
    sub = staticmethod(FQ.sub)
    neg = staticmethod(FQ.neg)
    mul = staticmethod(FQ.mul)
    sqr = staticmethod(FQ.sqr)
    inv = staticmethod(FQ.inv)
    is_zero = staticmethod(FQ.is_zero)
    eq = staticmethod(FQ.eq)
    select = staticmethod(FQ.select)
    zeros = staticmethod(FQ.zeros)
    ones = staticmethod(FQ.ones)

    @staticmethod
    def batch_of(a):
        return a.shape[1]

    # curve parameters (y^2 = x^3 + 3, generator (1, 2); mod.rs:372-402)
    @staticmethod
    def coeff_b(batch):
        return FQ.const(C.B1, batch)

    @staticmethod
    def generator(batch):
        return (FQ.const(C.G1_ONE[0], batch), FQ.const(C.G1_ONE[1], batch))

    @staticmethod
    def encode(vals):
        return FQ.encode(vals)

    @staticmethod
    def decode(a):
        return FQ.decode(a)


class DevFq2:
    add = staticmethod(T.fq2_add)
    sub = staticmethod(T.fq2_sub)
    neg = staticmethod(T.fq2_neg)
    mul = staticmethod(T.fq2_mul)
    sqr = staticmethod(T.fq2_sqr)
    inv = staticmethod(T.fq2_inv)
    is_zero = staticmethod(T.fq2_is_zero)
    eq = staticmethod(T.fq2_eq)
    select = staticmethod(T.fq2_select)
    zeros = staticmethod(T.fq2_zeros)
    ones = staticmethod(T.fq2_ones)

    @staticmethod
    def batch_of(a):
        return a[0].shape[1]

    # y^2 = x^3 + b2, b2 = 3/xi (D-type twist; mod.rs:408-472)
    @staticmethod
    def coeff_b(batch):
        return T.fq2_const(C.B2, batch)

    @staticmethod
    def generator(batch):
        return (T.fq2_const(C.G2_ONE[0], batch),
                T.fq2_const(C.G2_ONE[1], batch))

    @staticmethod
    def encode(vals):
        return T.fq2_encode(vals)

    @staticmethod
    def decode(a):
        return T.fq2_decode(a)


# ---------------------------------------------------------------------------
# Host codecs for point batches
# ---------------------------------------------------------------------------

def encode_points(K, pts):
    """Iterable of spec Jacobian triples (or None for infinity) -> device
    point batch.  None becomes (0, 1, 0)."""
    xs, ys, zs = [], [], []
    zero_v, one_v = _spec_zero_one(K)
    for p in pts:
        if p is None:
            xs.append(zero_v); ys.append(one_v); zs.append(zero_v)
        else:
            xs.append(p[0]); ys.append(p[1]); zs.append(p[2])
    return (K.encode(xs), K.encode(ys), K.encode(zs))


def decode_points(K, p):
    """Device point batch -> list of spec Jacobian triples."""
    return list(zip(K.decode(p[0]), K.decode(p[1]), K.decode(p[2])))


def _spec_zero_one(K):
    return ((0, 1) if K is DevFq else ((0, 0), (1, 0)))


# ---------------------------------------------------------------------------
# Generic branchless Jacobian group law
# ---------------------------------------------------------------------------

def zero_point(K, batch):
    """(0, 1, 0) (mod.rs:229-236)."""
    return (K.zeros(batch), K.ones(batch), K.zeros(batch))


def generator(K, batch):
    g = K.generator(batch)
    return (g[0], g[1], K.ones(batch))


def is_zero_point(K, p):
    return K.is_zero(p[2])


_JITTED = {}


def _memo_jit(fn, K, *args, static=(0,)):
    """Run fn under a MEMOIZED jax.jit for eager (non-traced, non-tape)
    inputs.

    Eagerly-dispatched lax.scan programs rebuild their jaxpr on every
    call, so jax's in-memory executable cache misses and each call goes
    through XLA:CPU compile OR persistent-cache deserialize — and that
    loader segfaults once a process has churned through enough large
    executables (round-2 root-cause hunt; see tests/conftest.py).  A
    stable jit-wrapped function compiles once per shape and then hits
    the C++ fastpath."""
    import jax.core

    leaf = jax.tree.leaves(args)[0]
    if isinstance(leaf, jax.core.Tracer) or getattr(leaf, "_tape_reg",
                                                    False):
        return fn(K, *args)
    j = _JITTED.get(fn)
    if j is None:
        j = jax.jit(fn, static_argnums=static)
        _JITTED[fn] = j
    return j(K, *args)


def double(K, p):
    """dbl-2009-l-style Jacobian doubling (mod.rs:250-269); maps the
    identity to the identity without branching (z stays 0).

    On TPU this is one fused Pallas kernel (pallas_fused.point_double)."""
    from .fields import _use_pallas
    if _use_pallas(K.batch_of(p[0])):
        from . import pallas_fused as PF
        return PF.point_double(1 if K is DevFq else 2, p)
    return _memo_jit(_double_jnp, K, p)


def _double_jnp(K, p):
    x, y, z = p
    a = K.sqr(x)
    b = K.sqr(y)
    c = K.sqr(b)
    d = K.sub(K.sub(K.sqr(K.add(x, b)), a), c)
    d = K.add(d, d)
    e = K.add(K.add(a, a), a)
    f = K.sqr(e)
    x3 = K.sub(f, K.add(d, d))
    ec = K.add(c, c)
    ec = K.add(ec, ec)
    ec = K.add(ec, ec)
    y1z1 = K.mul(y, z)
    return (x3, K.sub(K.mul(e, K.sub(d, x3)), ec), K.add(y1z1, y1z1))


def add(K, p, q):
    """Unified branchless Jacobian add (mod.rs:294-334).

    Computes the generic add and the doubling, then selects:
      p == inf           -> q
      q == inf           -> p
      u1==u2 && s1==s2   -> double(p)
      otherwise          -> generic (which yields z3 == 0 for P + (-P),
                            exactly like the reference's fallthrough)

    On TPU this is one fused Pallas kernel (pallas_fused.point_add).
    """
    from .fields import _use_pallas
    if _use_pallas(K.batch_of(p[0])):
        from . import pallas_fused as PF
        return PF.point_add(1 if K is DevFq else 2, p, q)
    return _memo_jit(_add_jnp, K, p, q)


def _add_jnp(K, p, q):
    p_inf = is_zero_point(K, p)
    q_inf = is_zero_point(K, q)

    z1s = K.sqr(p[2])
    z2s = K.sqr(q[2])
    u1 = K.mul(p[0], z2s)
    u2 = K.mul(q[0], z1s)
    z1c = K.mul(p[2], z1s)
    z2c = K.mul(q[2], z2s)
    s1 = K.mul(p[1], z2c)
    s2 = K.mul(q[1], z1c)

    coincide = K.eq(u1, u2) & K.eq(s1, s2) & ~p_inf & ~q_inf

    h = K.sub(u2, u1)
    s2_minus_s1 = K.sub(s2, s1)
    rr = K.add(s2_minus_s1, s2_minus_s1)
    i = K.sqr(K.add(h, h))
    j = K.mul(h, i)
    v = K.mul(u1, i)
    s1j = K.mul(s1, j)
    x3 = K.sub(K.sub(K.sqr(rr), j), K.add(v, v))
    y3 = K.sub(K.mul(rr, K.sub(v, x3)), K.add(s1j, s1j))
    z3 = K.mul(K.sub(K.sub(K.sqr(K.add(p[2], q[2])), z1s), z2s), h)
    generic = (x3, y3, z3)

    dbl = double(K, p)

    sel = lambda m, a, b: tuple(K.select(m, ai, bi) for ai, bi in zip(a, b))
    out = sel(coincide, dbl, generic)
    out = sel(q_inf, p, out)
    out = sel(p_inf, q, out)
    return out


def neg(K, p):
    """(mod.rs:336-350); identity is preserved by the z == 0 predicate."""
    return (p[0], K.neg(p[1]), p[2])


def eq_points(K, p, q):
    """Projective equality (mod.rs:169-195), branchless."""
    return _memo_jit(_eq_points_jnp, K, p, q)


def _eq_points_jnp(K, p, q):
    p_inf = is_zero_point(K, p)
    q_inf = is_zero_point(K, q)
    z1s = K.sqr(p[2])
    z2s = K.sqr(q[2])
    x_eq = K.eq(K.mul(p[0], z2s), K.mul(q[0], z1s))
    y_eq = K.eq(K.mul(p[1], K.mul(z2s, q[2])), K.mul(q[1], K.mul(z1s, p[2])))
    both = p_inf & q_inf
    neither = ~p_inf & ~q_inf
    return both | (neither & x_eq & y_eq)


def scalar_mul(K, p, k_limbs, num_bits: int = 256):
    """MSB-first double-and-add (mod.rs:272-292) as a fixed-length scan.

    k_limbs: canonical (NOT Montgomery) scalar limbs [N_LIMBS, B] — matching
    the reference, which exits Montgomery form before iterating bits
    (fp.rs:13-20).  Identical result to the reference's bit_length()-bounded
    loop because leading zero bits keep res at the identity.
    """
    return _memo_jit(_scalar_mul_jnp, K, p, k_limbs, num_bits,
                     static=(0, 3))


def _scalar_mul_jnp(K, p, k_limbs, num_bits):
    batch = K.batch_of(p[0])
    bit_idx = jnp.arange(num_bits - 1, -1, -1, dtype=jnp.int32)

    def body(res, i):
        res = double(K, res)
        limb = jax.lax.dynamic_index_in_dim(
            k_limbs, i // L.LIMB_BITS, axis=0, keepdims=False)
        bit = ((limb >> (i % L.LIMB_BITS).astype(jnp.uint32)) & 1).astype(bool)
        added = add(K, res, p)
        res = tuple(K.select(bit, a, r) for a, r in zip(added, res))
        return res, None

    res, _ = jax.lax.scan(body, zero_point(K, batch), bit_idx)
    return res


def to_affine(K, p):
    """((x, y), inf_mask): one Fermat inversion per element (mod.rs:198-217).

    Infinity slots return undefined coordinates and inf_mask True; callers
    select on the mask (the pairing maps them to f = 1, mod.rs:896).
    """
    zinv = K.inv(p[2])
    zi2 = K.sqr(zinv)
    x = K.mul(p[0], zi2)
    y = K.mul(p[1], K.mul(zi2, zinv))
    return (x, y), is_zero_point(K, p)


def to_jacobian(K, xy, inf_mask=None):
    """Affine -> Jacobian; optional inf_mask re-inserts identities."""
    batch = K.batch_of(xy[0])
    one = K.ones(batch)
    z = one if inf_mask is None else K.select(inf_mask, K.zeros(batch), one)
    return (xy[0], xy[1], z)


def on_curve(K, xy):
    """y^2 == x^3 + b (mod.rs:94-103) -> [B] bool."""
    batch = K.batch_of(xy[0])
    rhs = K.add(K.mul(K.sqr(xy[0]), xy[0]), K.coeff_b(batch))
    return K.eq(K.sqr(xy[1]), rhs)


def in_subgroup(K, xy):
    """Order check p*(r-1) + p == identity (mod.rs:104-107) -> [B] bool.

    Used by the G2 decode path (G2Params::check_order, mod.rs:469)."""
    batch = K.batch_of(xy[0])
    p = to_jacobian(K, xy)
    k = L.broadcast_const(L.limbs_from_int(C.R - 1), batch)
    return is_zero_point(K, add(K, scalar_mul(K, p, k), p))


# Convenience aliases
G1 = DevFq
G2 = DevFq2
