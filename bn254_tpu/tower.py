"""Batched device field tower Fq2/Fq6/Fq12 (SURVEY.md C4-C6; reference
/root/reference/src/fields/{fq2.rs,fq6.rs,fq12.rs}).

Elements are pytrees of Montgomery-form Fq batches ([N_LIMBS, B] uint32):

* Fq2  = (c0, c1)              — Fq[i]/(i^2+1)
* Fq6  = (c0, c1, c2) of Fq2   — Fq2[v]/(v^3 - xi), xi = 9+i
* Fq12 = (c0, c1) of Fq6       — Fq6[w]/(w^2 - v)

Formulas are the reference's exact algebra (Karatsuba fq2.rs:133, Devegili
fq6.rs:194, CH-SQR2 fq6.rs:163, Granger-Scott cyclotomic squaring
fq12.rs:198, sparse mul_by_024 fq12.rs:130) over the branchless limb core,
so canonical values agree bit-for-bit with the Rust crate.  Multiplication
by the non-residue xi = 9+i is strength-reduced to shifts/adds (9x = 8x+x),
which is value-identical to the reference's general mul (fq2.rs:55).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import limbs as L
from .fields import FQ, _is_reg
from .spec import constants as C

F = FQ  # the base-field context


def _tape_dispatch(a_leaf):
    """The tape module, when this call should run as a recorded
    instruction-tape program (CPU backend, not currently recording) —
    see tape.py.  a_leaf: any Fq leaf of the input (to skip dispatch
    while recording, when leaves are TapeRegs)."""
    if _is_reg(a_leaf):
        return None
    from . import tape
    return tape if tape.use_tape() else None


# ---------------------------------------------------------------------------
# Fq2
# ---------------------------------------------------------------------------

def fq2_encode(vals):
    """Iterable of (c0, c1) int pairs -> device Fq2 batch."""
    vals = list(vals)
    return (F.encode([v[0] for v in vals]), F.encode([v[1] for v in vals]))


def fq2_decode(a):
    return list(zip(F.decode(a[0]), F.decode(a[1])))


def fq2_zeros(batch):
    return (F.zeros(batch), F.zeros(batch))


def fq2_ones(batch):
    return (F.ones(batch), F.zeros(batch))


def fq2_const(pair, batch):
    return (F.const(pair[0], batch), F.const(pair[1], batch))


def fq2_add(a, b):
    return (F.add(a[0], b[0]), F.add(a[1], b[1]))


def fq2_sub(a, b):
    return (F.sub(a[0], b[0]), F.sub(a[1], b[1]))


def fq2_neg(a):
    return (F.neg(a[0]), F.neg(a[1]))


def fq2_double(a):
    return (F.double(a[0]), F.double(a[1]))


def fq2_scale(a, k):
    """Scale by an Fq batch (fq2.rs:48)."""
    return (F.mul(a[0], k), F.mul(a[1], k))


def fq2_mul(a, b):
    """Karatsuba with i^2 = -1 (fq2.rs:133-149): 3 Fq muls.

    On TPU backends the whole formula runs as one fused VMEM-resident
    Pallas kernel (pallas_kernels.fq2_mul); the jnp path is the reference.
    """
    from .fields import _use_pallas
    if _use_pallas(a[0].shape[1]):
        from . import pallas_kernels as PK
        return PK.fq2_mul(a, b, F.mod)
    aa = F.mul(a[0], b[0])
    bb = F.mul(a[1], b[1])
    cross = F.mul(F.add(a[0], a[1]), F.add(b[0], b[1]))
    return (F.sub(aa, bb), F.sub(F.sub(cross, aa), bb))


def fq2_sqr(a):
    """Complex squaring (fq2.rs:105-117): 2 Fq muls."""
    from .fields import _use_pallas
    if _use_pallas(a[0].shape[1]):
        from . import pallas_kernels as PK
        return PK.fq2_sqr(a, F.mod)
    ab = F.mul(a[0], a[1])
    t = F.mul(F.add(a[0], a[1]), F.sub(a[0], a[1]))
    return (t, F.add(ab, ab))


def _mul9(x):
    d = F.double(F.double(F.double(x)))
    return F.add(d, x)


def fq2_mul_by_xi(a):
    """a * (9 + i) via shift-add (value-identical to fq2.rs:55)."""
    return (F.sub(_mul9(a[0]), a[1]), F.add(_mul9(a[1]), a[0]))


def fq2_inv(a):
    """Norm inversion (fq2.rs:119-130); 0 -> 0 branchlessly."""
    t = F.inv(F.add(F.sqr(a[0]), F.sqr(a[1])))
    return (F.mul(a[0], t), F.neg(F.mul(a[1], t)))


def fq2_conj(a):
    """Frobenius for odd powers = conjugation (fq2.rs:59-68)."""
    return (a[0], F.neg(a[1]))


def fq2_frob(a, power: int):
    return a if power % 2 == 0 else fq2_conj(a)


def fq2_is_zero(a):
    return F.is_zero(a[0]) & F.is_zero(a[1])


def fq2_eq(a, b):
    return F.eq(a[0], b[0]) & F.eq(a[1], b[1])


def fq2_select(mask, a, b):
    return (F.select(mask, a[0], b[0]), F.select(mask, a[1], b[1]))


def fq2_sqrt(a):
    """(root, ok_mask): complex-method sqrt (fq2.rs:208-224), branchless.

    Matches the reference's value on residues; ok_mask is False exactly on
    non-residues.  Only used on the decompression path, so the fixed
    ladders' cost is acceptable.
    """
    tp = _tape_dispatch(a[0])
    if tp is not None:
        return tp.fq2_sqrt(a)
    batch = a[0].shape[1]
    a1 = _fq2_pow_scan(a, C.FQ_MINUS3_DIV4)
    a1a = fq2_mul(a1, a)
    alpha = fq2_mul(a1, a1a)
    a0 = fq2_mul(_fq2_pow_scan(alpha, C.Q), alpha)
    neg_one = fq2_const((C.Q - 1, 0), batch)
    is_nonres = fq2_eq(a0, neg_one)
    alpha_is_neg1 = fq2_eq(alpha, neg_one)
    # branch A: alpha == -1  ->  i * a1a
    i_elem = fq2_const((0, 1), batch)
    root_a = fq2_mul(i_elem, a1a)
    # branch B: b = (alpha+1)^((q-1)/2) * a1a
    b = _fq2_pow_scan(fq2_add(alpha, fq2_ones(batch)), C.FQ_MINUS1_DIV2)
    root_b = fq2_mul(b, a1a)
    return fq2_select(alpha_is_neg1, root_a, root_b), ~is_nonres


def _fq2_pow_scan(a, e: int):
    """Fixed-exponent Fq2 power as a lax.scan (keeps HLO small for the
    ~254-bit decompression exponents)."""
    import numpy as np
    import jax

    if _is_reg(a[0]):
        # tape recording: unroll with static bits (value-identical to the
        # select-based scan — leading-bit start vs ones+select agree)
        if e == 0:
            return fq2_ones(1)
        res = a
        for i in reversed(range(e.bit_length() - 1)):
            res = fq2_sqr(res)
            if (e >> i) & 1:
                res = fq2_mul(res, a)
        return res

    batch = a[0].shape[1]
    if e == 0:
        return fq2_ones(batch)
    bits = np.array([(e >> i) & 1 for i in reversed(range(e.bit_length()))],
                    dtype=np.bool_)

    def body(res, bit):
        res = fq2_sqr(res)
        mul = fq2_mul(res, a)
        return fq2_select(jnp.broadcast_to(bit, (batch,)), mul, res), None

    res, _ = jax.lax.scan(body, fq2_ones(batch), jnp.asarray(bits))
    return res


# ---------------------------------------------------------------------------
# Fq6
# ---------------------------------------------------------------------------

def fq6_encode(vals):
    vals = list(vals)
    return tuple(fq2_encode([v[k] for v in vals]) for k in range(3))


def fq6_decode(a):
    cs = [fq2_decode(c) for c in a]
    return list(zip(*cs))


def fq6_zeros(batch):
    return (fq2_zeros(batch), fq2_zeros(batch), fq2_zeros(batch))


def fq6_ones(batch):
    return (fq2_ones(batch), fq2_zeros(batch), fq2_zeros(batch))


def fq6_add(a, b):
    return tuple(fq2_add(x, y) for x, y in zip(a, b))


def fq6_sub(a, b):
    return tuple(fq2_sub(x, y) for x, y in zip(a, b))


def fq6_neg(a):
    return tuple(fq2_neg(x) for x in a)


def fq6_scale(a, k2):
    """Scale by an Fq2 batch (fq6.rs:117-123)."""
    return tuple(fq2_mul(x, k2) for x in a)


def fq6_mul_by_nonresidue(a):
    """v * (c0 + c1 v + c2 v^2) = xi c2 + c0 v + c1 v^2 (fq6.rs:109-115)."""
    return (fq2_mul_by_xi(a[2]), a[0], a[1])


def fq6_mul(a, b):
    """Devegili et al. interpolation mul (fq6.rs:194-208): 6 Fq2 muls."""
    a_a = fq2_mul(a[0], b[0])
    b_b = fq2_mul(a[1], b[1])
    c_c = fq2_mul(a[2], b[2])
    c0 = fq2_add(
        fq2_mul_by_xi(fq2_sub(fq2_sub(
            fq2_mul(fq2_add(a[1], a[2]), fq2_add(b[1], b[2])), b_b), c_c)),
        a_a)
    c1 = fq2_add(
        fq2_sub(fq2_sub(fq2_mul(fq2_add(a[0], a[1]), fq2_add(b[0], b[1])),
                        a_a), b_b),
        fq2_mul_by_xi(c_c))
    c2 = fq2_sub(
        fq2_add(fq2_sub(fq2_mul(fq2_add(a[0], a[2]), fq2_add(b[0], b[2])),
                        a_a), b_b),
        c_c)
    return (c0, c1, c2)


def fq6_sqr(a):
    """CH-SQR2 squaring (fq6.rs:163-177)."""
    s0 = fq2_sqr(a[0])
    ab = fq2_mul(a[0], a[1])
    s1 = fq2_add(ab, ab)
    s2 = fq2_sqr(fq2_add(fq2_sub(a[0], a[1]), a[2]))
    bc = fq2_mul(a[1], a[2])
    s3 = fq2_add(bc, bc)
    s4 = fq2_sqr(a[2])
    return (
        fq2_add(s0, fq2_mul_by_xi(s3)),
        fq2_add(s1, fq2_mul_by_xi(s4)),
        fq2_sub(fq2_sub(fq2_add(fq2_add(s1, s2), s3), s0), s4),
    )


def fq6_inv(a):
    """(fq6.rs:179-192); 0 -> 0 branchlessly."""
    c0 = fq2_sub(fq2_sqr(a[0]), fq2_mul(a[1], fq2_mul_by_xi(a[2])))
    c1 = fq2_sub(fq2_mul_by_xi(fq2_sqr(a[2])), fq2_mul(a[0], a[1]))
    c2 = fq2_sub(fq2_sqr(a[1]), fq2_mul(a[0], a[2]))
    t = fq2_inv(fq2_add(
        fq2_mul_by_xi(fq2_add(fq2_mul(a[2], c1), fq2_mul(a[1], c2))),
        fq2_mul(a[0], c0)))
    return (fq2_mul(t, c0), fq2_mul(t, c1), fq2_mul(t, c2))


def fq6_frob(a, power: int):
    """(fq6.rs:125-131) with the precomputed xi-power tables."""
    batch = a[0][0].shape[1]
    return (
        fq2_frob(a[0], power),
        fq2_mul(fq2_frob(a[1], power), fq2_const(C.FROB6_C1[power % 6], batch)),
        fq2_mul(fq2_frob(a[2], power), fq2_const(C.FROB6_C2[power % 6], batch)),
    )


def fq6_eq(a, b):
    return fq2_eq(a[0], b[0]) & fq2_eq(a[1], b[1]) & fq2_eq(a[2], b[2])


def fq6_select(mask, a, b):
    return tuple(fq2_select(mask, x, y) for x, y in zip(a, b))


# ---------------------------------------------------------------------------
# Fq12
# ---------------------------------------------------------------------------

def fq12_encode(vals):
    vals = list(vals)
    return (fq6_encode([v[0] for v in vals]), fq6_encode([v[1] for v in vals]))


def fq12_decode(a):
    return list(zip(fq6_decode(a[0]), fq6_decode(a[1])))


def fq12_zeros(batch):
    return (fq6_zeros(batch), fq6_zeros(batch))


def fq12_ones(batch):
    return (fq6_ones(batch), fq6_zeros(batch))


def fq12_add(a, b):
    return (fq6_add(a[0], b[0]), fq6_add(a[1], b[1]))


def fq12_sub(a, b):
    return (fq6_sub(a[0], b[0]), fq6_sub(a[1], b[1]))


def fq12_neg(a):
    return (fq6_neg(a[0]), fq6_neg(a[1]))


def fq12_mul(a, b):
    """Karatsuba over Fq6 (fq12.rs:316-328): 3 Fq6 muls = 18 Fq2 muls.

    On TPU this is ONE fused Pallas kernel (54 Montgomery muls VMEM-
    resident, pallas_fused.fq12_mul); the jnp path is the reference."""
    from .fields import _use_pallas
    if _use_pallas(a[0][0][0].shape[1]):
        from . import pallas_fused as PF
        return PF.fq12_mul(a, b)
    aa = fq6_mul(a[0], b[0])
    bb = fq6_mul(a[1], b[1])
    cross = fq6_mul(fq6_add(a[0], a[1]), fq6_add(b[0], b[1]))
    return (
        fq6_add(fq6_mul_by_nonresidue(bb), aa),
        fq6_sub(fq6_sub(cross, aa), bb),
    )


def fq12_sqr(a):
    """(fq12.rs:295-303)."""
    from .fields import _use_pallas
    if _use_pallas(a[0][0][0].shape[1]):
        from . import pallas_fused as PF
        return PF.fq12_sqr(a)
    ab = fq6_mul(a[0], a[1])
    return (
        fq6_sub(fq6_sub(
            fq6_mul(fq6_add(fq6_mul_by_nonresidue(a[1]), a[0]),
                    fq6_add(a[0], a[1])), ab),
            fq6_mul_by_nonresidue(ab)),
        fq6_add(ab, ab),
    )


def fq12_inv(a):
    """(fq12.rs:305-313); 0 -> 0 branchlessly."""
    t = fq6_inv(fq6_sub(fq6_sqr(a[0]), fq6_mul_by_nonresidue(fq6_sqr(a[1]))))
    return (fq6_mul(a[0], t), fq6_neg(fq6_mul(a[1], t)))


def fq12_conj(a):
    """Unitary inverse (fq12.rs:126)."""
    return (a[0], fq6_neg(a[1]))


def fq12_frob(a, power: int):
    """(fq12.rs:112-119)."""
    batch = a[0][0][0].shape[1]
    return (
        fq6_frob(a[0], power),
        fq6_scale(fq6_frob(a[1], power), fq2_const(C.FROB12_C1[power % 12], batch)),
    )


def fq12_eq(a, b):
    return fq6_eq(a[0], b[0]) & fq6_eq(a[1], b[1])


def fq12_select(mask, a, b):
    return (fq6_select(mask, a[0], b[0]), fq6_select(mask, a[1], b[1]))


def fq12_mul_by_024(a, ell_0, ell_vv, ell_vw):
    """Sparse line multiplication — THE hot op of the Miller loop; 13 Fq2
    muls (fq12.rs:130-196).  NOTE the argument order matches the spec
    oracle: (x0, x2, x4) = (ell_0, ell_vv, ell_vw)."""
    (z0, z1, z2), (z3, z4, z5) = a
    x0, x2, x4 = ell_0, ell_vv, ell_vw

    d0 = fq2_mul(z0, x0)
    d2 = fq2_mul(z2, x2)
    d4 = fq2_mul(z4, x4)
    t2 = fq2_add(z0, z4)
    t1 = fq2_add(z0, z2)
    s0 = fq2_add(fq2_add(z1, z3), z5)

    s1 = fq2_mul(z1, x2)
    t3 = fq2_add(s1, d4)
    t4 = fq2_add(fq2_mul_by_xi(t3), d0)
    nz0 = t4

    t3 = fq2_mul(z5, x4)
    s1 = fq2_add(s1, t3)
    t3 = fq2_add(t3, d2)
    t4 = fq2_mul_by_xi(t3)
    t3 = fq2_mul(z1, x0)
    s1 = fq2_add(s1, t3)
    t4 = fq2_add(t4, t3)
    nz1 = t4

    t0 = fq2_add(x0, x2)
    t3 = fq2_sub(fq2_sub(fq2_mul(t1, t0), d0), d2)
    t4 = fq2_mul(z3, x4)
    s1 = fq2_add(s1, t4)
    t3 = fq2_add(t3, t4)

    t0 = fq2_add(z2, z4)
    nz2 = t3

    t1 = fq2_add(x2, x4)
    t3 = fq2_sub(fq2_sub(fq2_mul(t0, t1), d2), d4)
    t4 = fq2_mul_by_xi(t3)
    t3 = fq2_mul(z3, x0)
    s1 = fq2_add(s1, t3)
    t4 = fq2_add(t4, t3)
    nz3 = t4

    t3 = fq2_mul(z5, x2)
    s1 = fq2_add(s1, t3)
    t4 = fq2_mul_by_xi(t3)
    t0 = fq2_add(x0, x4)
    t3 = fq2_sub(fq2_sub(fq2_mul(t2, t0), d0), d4)
    t4 = fq2_add(t4, t3)
    nz4 = t4

    t0 = fq2_add(fq2_add(x0, x2), x4)
    t3 = fq2_sub(fq2_mul(s0, t0), s1)
    nz5 = t3

    return ((nz0, nz1, nz2), (nz3, nz4, nz5))


def fq12_cyclotomic_sqr(a):
    """Granger-Scott squaring in the cyclotomic subgroup (fq12.rs:198-247)."""
    from .fields import _use_pallas
    if _use_pallas(a[0][0][0].shape[1]):
        from . import pallas_fused as PF
        return PF.fq12_cyclotomic_sqr(a)
    (z0, z4, z3), (z2, z1, z5) = a

    def _sq_pair(u, v):
        tmp = fq2_mul(u, v)
        t_a = fq2_sub(fq2_sub(
            fq2_mul(fq2_add(u, v), fq2_add(fq2_mul_by_xi(v), u)), tmp),
            fq2_mul_by_xi(tmp))
        t_b = fq2_add(tmp, tmp)
        return t_a, t_b

    t0, t1 = _sq_pair(z0, z1)
    t2, t3 = _sq_pair(z2, z3)
    t4, t5 = _sq_pair(z4, z5)

    def _tri(base, t, sub):
        x = fq2_sub(t, base) if sub else fq2_add(t, base)
        x = fq2_add(x, x)
        return fq2_add(x, t)

    nz0 = _tri(z0, t0, True)
    nz1 = _tri(z1, t1, False)
    tmp = fq2_mul_by_xi(t5)
    nz2 = _tri(z2, tmp, False)
    nz3 = _tri(z3, t4, True)
    nz4 = _tri(z4, t2, True)
    nz5 = _tri(z5, t3, False)

    return ((nz0, nz4, nz3), (nz2, nz1, nz5))


def fq12_cyclotomic_pow_z(a):
    """a^z for the static BN parameter z = 4965661367192848881
    (fq12.rs:249-267 driven by :122), as a lax.scan over z's bits (one
    fused ladder kernel on TPU)."""
    import numpy as np
    import jax

    if _is_reg(a[0][0][0]):
        # tape recording: unroll the static 63-bit ladder
        res = a
        e = C.Z
        for i in reversed(range(e.bit_length() - 1)):
            res = fq12_cyclotomic_sqr(res)
            if (e >> i) & 1:
                res = fq12_mul(a, res)
        return res

    batch = a[0][0][0].shape[1]
    from .fields import _use_pallas
    if _use_pallas(batch):
        from . import pallas_fused as PF
        return PF.fq12_cyclotomic_pow_z(a)
    e = C.Z
    nbits = e.bit_length()
    # MSB-first, skipping the leading 1 (res starts at a, exactly like the
    # reference's found_one dance).
    bits = np.array([(e >> i) & 1 for i in reversed(range(nbits - 1))],
                    dtype=np.bool_)

    def body(res, bit):
        res = fq12_cyclotomic_sqr(res)
        mul = fq12_mul(a, res)
        return fq12_select(jnp.broadcast_to(bit, (batch,)), mul, res), None

    res, _ = jax.lax.scan(body, a, jnp.asarray(bits))
    return res


def fq12_exp_by_neg_z(a):
    """(fq12.rs:121-124)."""
    tp = _tape_dispatch(a[0][0][0])
    if tp is not None:
        return tp.exp_by_neg_z(a)
    return fq12_conj(fq12_cyclotomic_pow_z(a))


def fq12_exp_by_neg_z_unitary(a):
    """exp_by_neg_z for inputs known to lie in the cyclotomic subgroup
    G_phi6(q^2) — every call site inside the final exponentiation (the
    easy chunk maps onto x^((q^6-1)(q^2+1))).  On the fused TPU path
    this takes the NAF ladder with conjugation as the free inverse (23
    multiplies instead of 27); bit-identical to fq12_exp_by_neg_z
    there.  Other backends fall through to the formula-pinned ladder."""
    if not _is_reg(a[0][0][0]) and _tape_dispatch(a[0][0][0]) is None:
        from .fields import _use_pallas
        if _use_pallas(a[0][0][0].shape[1]):
            from . import pallas_fused as PF
            return fq12_conj(PF.fq12_cyclotomic_pow_z_unitary(a))
    return fq12_exp_by_neg_z(a)


def _staged(fn, *args):
    """Compile barrier: run fn as a length-1 scan so XLA keeps its body a
    separate computation.  On CPU, LLVM compile time of one huge function
    is superlinear — the unfused final exponentiation as straight-line
    code takes hours to compile; chunked, minutes.  No-op semantically.
    """
    import jax

    if any(_is_reg(leaf) for leaf in jax.tree.leaves(args)):
        return fn(*args)  # tape recording: barriers are meaningless

    def body(carry, xs):
        return carry, fn(*xs)

    _, out = jax.lax.scan(body, None,
                          jax.tree.map(lambda x: x[None], args))
    return jax.tree.map(lambda x: x[0], out)


def fq12_final_exponentiation(a):
    """Easy chunk + Scott et al. hard chunk (fq12.rs:62-110).

    Branchless: a non-invertible (zero) input yields 0, never produced by
    the Miller loop.  On the jnp (CPU) path the big sub-steps run behind
    compile barriers (see _staged); on the fused TPU path the graph is
    already small and stays flat.
    """
    tp = _tape_dispatch(a[0][0][0])
    if tp is not None:
        return tp.final_exponentiation(a)

    from .fields import _use_pallas

    batch = a[0][0][0].shape[1]
    if _use_pallas(batch):
        stage2 = fq12_mul
        stage1 = lambda f, x: f(x)
    else:
        stage2 = lambda x, y: _staged(fq12_mul, x, y)
        stage1 = lambda f, x: _staged(f, x)

    inv = stage1(fq12_inv, a)
    c = stage2(fq12_conj(a), inv)
    f = stage2(fq12_frob(c, 2), c)

    a_ = fq12_exp_by_neg_z_unitary(f)
    b = stage1(fq12_cyclotomic_sqr, a_)
    c2 = stage1(fq12_cyclotomic_sqr, b)
    d = stage2(c2, b)

    e = fq12_exp_by_neg_z_unitary(d)
    f2 = stage1(fq12_cyclotomic_sqr, e)
    g = fq12_exp_by_neg_z_unitary(f2)
    h = fq12_conj(d)
    i = fq12_conj(g)

    j = stage2(i, e)
    k = stage2(j, h)
    l = stage2(k, b)
    m = stage2(k, e)
    n = stage2(f, m)

    o = fq12_frob(l, 1)
    p = stage2(o, n)

    q = fq12_frob(k, 2)
    r = stage2(q, p)

    s = fq12_conj(f)
    t = stage2(s, l)
    u = fq12_frob(t, 3)
    v = stage2(u, r)
    return v
