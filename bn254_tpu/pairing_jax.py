"""Batched device optimal-ate pairing (SURVEY.md C9; reference
/root/reference/src/groups/mod.rs:515-777,894-926).

TPU-first design, deliberately different from the reference's serial
structure:

* G2 precompute is a fixed 85-step lax.scan over a flattened step schedule
  (64 doublings interleaved with 21 NAF additions, derived statically from
  ATE_NAF), followed by the 2 Frobenius addition steps — yielding the same
  87 EllCoeffs triples in the same order (mod.rs:701-728, count assert
  :891).  Doubling/addition are both computed per step and masked-selected
  (branchless, 1.32x step overhead, amortized: precompute is once per
  input).
* The Miller loop is a fixed 87-step lax.scan over the coeff tensor with a
  static per-step "square first" flag (mod.rs:580-606).
* Batching is data-parallel over the pair axis: each pair runs its own
  Miller accumulator, then the per-pair f's are product-reduced and a
  single final exponentiation is applied.  This is algebraically (and
  therefore bit-) identical to the reference's shared-squaring
  miller_loop_batch (mod.rs:609-640) because squaring distributes over
  products in the commutative Fq12 — but it parallelizes over lanes and
  shards instead of serializing over pairs.
* Infinity pairs contribute f = 1 via masked select — the reference's
  "silent skip" (mod.rs:911-924).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import tower as T
from . import groups as G
from .fields import FQ
from .spec import constants as C

F = FQ

# ---------------------------------------------------------------------------
# Static schedules derived from ATE_NAF (groups/mod.rs:14)
# ---------------------------------------------------------------------------

# Precompute: 85 fused steps (dbl always; add on nonzero digits), then the 2
# Frobenius additions handled outside the scan.
# step kinds: 0 = doubling, 1 = add Q, 2 = add -Q
_PRE_KINDS = []
for _d in C.ATE_NAF:
    _PRE_KINDS.append(0)
    if _d == 1:
        _PRE_KINDS.append(1)
    elif _d == -1:
        _PRE_KINDS.append(2)
_PRE_KINDS = np.array(_PRE_KINDS, dtype=np.int32)
assert len(_PRE_KINDS) + 2 == C.N_COEFFS == 87

# Miller loop: square-before-fold flag per coeff (1 on doubling coeffs).
_SQR_FLAGS = np.array(
    [k == 0 for k in _PRE_KINDS] + [False, False], dtype=np.bool_)
assert _SQR_FLAGS.sum() == 64 and len(_SQR_FLAGS) == 87


# ---------------------------------------------------------------------------
# Precompute steps (mod.rs:731-776) — Fq2 batches
# ---------------------------------------------------------------------------

def _doubling_step(r, two_inv):
    """(mod.rs:754-776): returns (new_r, (ell_0, ell_vw, ell_vv))."""
    x, y, z = r
    batch = x[0].shape[1]
    a = T.fq2_scale(T.fq2_mul(x, y), two_inv)
    b = T.fq2_sqr(y)
    c = T.fq2_sqr(z)
    d = T.fq2_add(T.fq2_add(c, c), c)
    e = T.fq2_mul(T.fq2_const(C.B2, batch), d)
    f = T.fq2_add(T.fq2_add(e, e), e)
    g = T.fq2_scale(T.fq2_add(b, f), two_inv)
    h = T.fq2_sub(T.fq2_sqr(T.fq2_add(y, z)), T.fq2_add(b, c))
    i = T.fq2_sub(e, b)
    j = T.fq2_sqr(x)
    e_sq = T.fq2_sqr(e)

    nx = T.fq2_mul(a, T.fq2_sub(b, f))
    ny = T.fq2_sub(T.fq2_sqr(g), T.fq2_add(T.fq2_add(e_sq, e_sq), e_sq))
    nz = T.fq2_mul(b, h)

    ell_0 = T.fq2_mul_by_xi(i)
    ell_vw = T.fq2_neg(h)
    ell_vv = T.fq2_add(T.fq2_add(j, j), j)
    return (nx, ny, nz), (ell_0, ell_vw, ell_vv)


def _addition_step(r, base):
    """Mixed addition vs an affine base (mod.rs:731-752)."""
    x, y, z = r
    bx, by = base
    d = T.fq2_sub(x, T.fq2_mul(z, bx))
    e = T.fq2_sub(y, T.fq2_mul(z, by))
    f = T.fq2_sqr(d)
    g = T.fq2_sqr(e)
    h = T.fq2_mul(d, f)
    i = T.fq2_mul(x, f)
    j = T.fq2_sub(T.fq2_add(T.fq2_mul(z, g), h), T.fq2_add(i, i))

    nx = T.fq2_mul(d, j)
    ny = T.fq2_sub(T.fq2_mul(e, T.fq2_sub(i, j)), T.fq2_mul(h, y))
    nz = T.fq2_mul(z, h)

    ell_0 = T.fq2_mul_by_xi(T.fq2_sub(T.fq2_mul(e, bx), T.fq2_mul(d, by)))
    ell_vw = d
    ell_vv = T.fq2_neg(e)
    return (nx, ny, nz), (ell_0, ell_vw, ell_vv)


def _mul_by_q(pt):
    """Frobenius endomorphism on affine G2 via twist factors
    (mod.rs:693-699)."""
    x, y = pt
    batch = x[0].shape[1]
    return (T.fq2_mul(T.fq2_const(C.TWIST_MUL_BY_Q_X, batch), T.fq2_conj(x)),
            T.fq2_mul(T.fq2_const(C.TWIST_MUL_BY_Q_Y, batch), T.fq2_conj(y)))


def _tape_dispatch(a_leaf):
    """tape.py engine when on the CPU backend (and not mid-recording)."""
    if getattr(a_leaf, "_tape_reg", False):
        return None
    from . import tape
    return tape if tape.use_tape() else None


def precompute(q_affine):
    """87 line-coefficient triples per batch element (mod.rs:701-728).

    q_affine: affine G2 batch ((x, y) of Fq2 [N, B]).
    Returns coeffs pytree with leading axis 87 on every leaf.
    """
    tp = _tape_dispatch(q_affine[0][0])
    if tp is not None:
        return tp.precompute(q_affine)
    batch = q_affine[0][0].shape[1]
    two_inv = F.const(pow(2, C.Q - 2, C.Q), batch)
    q_neg = (q_affine[0], T.fq2_neg(q_affine[1]))
    r0 = (q_affine[0], q_affine[1], T.fq2_ones(batch))

    from .fields import _use_pallas
    fused = _use_pallas(batch)

    def body(r, kind):
        if fused:
            from . import pallas_fused as PF
            r_dbl, c_dbl = PF.g2_dbl_step(r)
        else:
            r_dbl, c_dbl = _doubling_step(r, two_inv)
        # base = Q (kind 1) or -Q (kind 2); irrelevant when kind == 0
        add_q = jnp.broadcast_to(kind == 1, (batch,))
        base = (T.fq2_select(add_q, q_affine[0], q_neg[0]),
                T.fq2_select(add_q, q_affine[1], q_neg[1]))
        if fused:
            from . import pallas_fused as PF
            r_add, c_add = PF.g2_add_step(r, base)
        else:
            r_add, c_add = _addition_step(r, base)
        mask = jnp.broadcast_to(kind == 0, (batch,))
        sel3 = lambda a, b: tuple(T.fq2_select(mask, x, y)
                                  for x, y in zip(a, b))
        return sel3(r_dbl, r_add), sel3(c_dbl, c_add)

    r, coeffs = jax.lax.scan(body, r0, jnp.asarray(_PRE_KINDS))

    q1 = _mul_by_q(q_affine)
    q2 = _mul_by_q(q1)
    q2 = (q2[0], T.fq2_neg(q2[1]))
    if fused:
        from . import pallas_fused as PF
        r, c86 = PF.g2_add_step(r, q1)
        r, c87 = PF.g2_add_step(r, q2)
    else:
        r, c86 = _addition_step(r, q1)
        r, c87 = _addition_step(r, q2)

    # append the two Frobenius-addition coeffs -> leading axis 87
    tail = jax.tree.map(lambda a, b: jnp.stack([a, b], axis=0), c86, c87)
    return jax.tree.map(lambda head, t: jnp.concatenate([head, t], axis=0),
                        coeffs, tail)


# ---------------------------------------------------------------------------
# Miller loop + pairing
# ---------------------------------------------------------------------------

def miller_loop(coeffs, p_affine):
    """Fixed 87-step scan (mod.rs:580-606): f = [sqr] then fold line.

    coeffs: pytree with leading 87 axis; p_affine: affine G1 batch (x, y).
    Returns the un-exponentiated Fq12 batch.
    """
    px, py = p_affine
    batch = px.shape[1]
    from .fields import _use_pallas
    fused = _use_pallas(batch)

    def body(f, step):
        flag, c = step
        ell_0, ell_vw, ell_vv = c
        f_sq = T.fq12_sqr(f)
        f = T.fq12_select(jnp.broadcast_to(flag, (batch,)), f_sq, f)
        if fused:
            from . import pallas_fused as PF
            f = PF.fq12_fold_line(f, c, px, py)
        else:
            f = T.fq12_mul_by_024(f, ell_0, T.fq2_scale(ell_vv, px),
                                  T.fq2_scale(ell_vw, py))
        return f, None

    f0 = T.fq12_ones(batch)
    f, _ = jax.lax.scan(body, f0, (jnp.asarray(_SQR_FLAGS), coeffs))
    return f


def _miller_f_fused(qa, pa):
    """Fused-kernel Miller loop: one kernel for the 85 scheduled steps
    (precompute interleaved with the fold — see pallas_fused
    miller_precompute), then the 2 Frobenius addition steps + folds
    (mod.rs:717-721, :630-638) on the step kernels.  Bit-exact vs
    precompute() + miller_loop()."""
    from . import pallas_fused as PF

    f, r = PF.miller_precompute(qa, pa, _PRE_KINDS.reshape(-1, 1))
    q1 = _mul_by_q(qa)
    q2 = _mul_by_q(q1)
    q2 = (q2[0], T.fq2_neg(q2[1]))
    r, c86 = PF.g2_add_step(r, q1)
    f = PF.fq12_fold_line(f, c86, pa[0], pa[1])
    r, c87 = PF.g2_add_step(r, q2)
    f = PF.fq12_fold_line(f, c87, pa[0], pa[1])
    return f


def fq12_product_reduce(f, keep_batch=False):
    """Product over the batch axis (log-depth tree).

    The TPU replacement for the reference's serial per-pair folds in
    miller_loop_batch (mod.rs:614-628).

    On the fused-kernel path with a power-of-two batch >= 128, the
    reduction keeps the batch CONSTANT (roll-and-multiply: lane 0
    accumulates the full product) so every step stays on the fused
    kernels — shrinking batches would fall back to the huge unfused
    graphs that the TPU AOT compiler cannot hold.  With keep_batch=True
    the full-batch result is returned (product in lane 0) so callers can
    run further full-batch ops (e.g. the final exponentiation) before
    slicing.
    """
    from .fields import _use_pallas

    n = f[0][0][0].shape[-1]
    if n > 1 and n & (n - 1) == 0 and _use_pallas(n):
        k = 1
        while k < n:
            shifted = jax.tree.map(lambda a: jnp.roll(a, -k, axis=-1), f)
            f = T.fq12_mul(f, shifted)
            k *= 2
        if keep_batch:
            return f
        return jax.tree.map(lambda a: a[..., :1], f)

    def halve(f, n):
        while n > 1:
            half = n // 2
            lo = jax.tree.map(lambda a: a[..., :half], f)
            hi = jax.tree.map(lambda a: a[..., half:2 * half], f)
            prod = T.fq12_mul(lo, hi)
            if n % 2:
                tailed = jax.tree.map(
                    lambda p, a: jnp.concatenate([p, a[..., 2 * half:]],
                                                 axis=-1), prod, f)
                prod, n = tailed, half + 1
            else:
                n = half
            f = prod
        return f

    out = halve(f, n)
    if keep_batch:
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, a.shape[:-1] + (n,)), out)
    return out


def miller_loop_batch(g2_points, g1_points, keep_batch=False):
    """Un-exponentiated product of pairings over the batch axis.

    g2_points/g1_points: Jacobian device batches.  Pairs where either point
    is at infinity contribute f = 1 (mod.rs:911-920 silent-skip semantics).
    Returns a batch-1 Fq12, or (keep_batch=True) a full-batch Fq12 whose
    lane 0 holds the product — so downstream ops can stay on the fused
    kernels at full width.
    """
    tp = _tape_dispatch(g1_points[0])
    if tp is not None:
        return tp.miller_loop_batch(g2_points, g1_points,
                                    keep_batch=keep_batch)
    pa, p_inf = G.to_affine(G.G1, g1_points)
    qa, q_inf = G.to_affine(G.G2, g2_points)
    from .fields import _use_pallas
    if _use_pallas(pa[0].shape[1]):
        f = _miller_f_fused(qa, pa)
    else:
        f = miller_loop(precompute(qa), pa)
    skip = p_inf | q_inf
    f = T.fq12_select(skip, T.fq12_ones(pa[0].shape[1]), f)
    return fq12_product_reduce(f, keep_batch=keep_batch)


def pairing_batch(g1_points, g2_points):
    """Reduced product-of-pairings (mod.rs:904-926): one shared final
    exponentiation.  Returns a batch-1 Fq12 (the Gt element).

    The final exponentiation runs at FULL batch width on the fused path
    (the product held in lane 0) and is sliced afterwards — a batch-1
    tail would fall off the fused kernels into graphs the TPU AOT
    compiler cannot hold.
    """
    tp = _tape_dispatch(g1_points[0])
    if tp is not None:
        return tp.pairing_batch(g1_points, g2_points)
    f = miller_loop_batch(g2_points, g1_points, keep_batch=True)
    out = T.fq12_final_exponentiation(f)
    return jax.tree.map(lambda a: a[..., :1], out)


def pairing(g1_point, g2_point):
    """Single reduced pairing of batch-aligned points (mod.rs:894-902);
    infinity in either slot gives the GT identity.  Batched: returns a
    per-element Fq12 batch (no product reduction)."""
    tp = _tape_dispatch(g1_point[0])
    if tp is not None:
        return tp.pairing(g1_point, g2_point)
    pa, p_inf = G.to_affine(G.G1, g1_point)
    qa, q_inf = G.to_affine(G.G2, g2_point)
    from .fields import _use_pallas
    if _use_pallas(pa[0].shape[1]):
        f = _miller_f_fused(qa, pa)
    else:
        f = miller_loop(precompute(qa), pa)
    skip = p_inf | q_inf
    f = T.fq12_select(skip, T.fq12_ones(pa[0].shape[1]), f)
    return T.fq12_final_exponentiation(f)
