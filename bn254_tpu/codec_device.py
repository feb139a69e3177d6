"""Batched compressed-point decompression on the device (ingest path).

The reference decodes one point at a time on the CPU
(lib.rs:359-376 G1 33B, :506-527 G2 65B); the host codec
(`spec/codec.py`) matches it exactly, exceptions and all.  This module is
the throughput variant: N compressed points -> one batched device program
(sqrt ladders, parity/lexicographic y selection, curve/subgroup checks),
returning Jacobian batches plus validity masks instead of exceptions —
the vector analogue of the reference's error taxonomy:

    ok == False covers   InvalidEncoding (bad prefix)
                       | NotMember (x >= q, non-residue, bad subgroup)

Byte parsing (fixed slicing, U512 divrem for the Fq2 packing) stays on
the host — it is O(bytes) and data-dependent; all field/curve math runs
batched on the device.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import groups as G
from . import limbs as L
from . import tower as T
from .fields import FQ
from .spec import constants as C

__all__ = ["g1_decompress_batch", "g2_decompress_batch"]


def _limb_gt(a, b):
    """a > b on canonical [N, B] limb arrays (unsigned, limb-wise)."""
    gt = None
    eq = None
    for k in range(L.N_LIMBS - 1, -1, -1):
        g_k = a[k] > b[k]
        e_k = a[k] == b[k]
        if gt is None:
            gt, eq = g_k, e_k
        else:
            gt = gt | (eq & g_k)
            eq = eq & e_k
    return gt


def _canonical(a):
    """Montgomery form -> canonical limbs (one extra reduction: a*R * 1
    * R^-1 = a)."""
    one = L.broadcast_const(np.asarray(L.limbs_from_int(1)), a.shape[1])
    return L.mont_mul(a, one, FQ.mod)


def g1_decompress_batch(prefixes, xs):
    """prefixes: [B] int32 (0x02/0x03); xs: [N, B] Montgomery-form Fq
    (x < q enforced by the host parser).  Returns (jacobian_point, ok).

    Semantics match lib.rs:359-376: y = sqrt(x^3 + 3), pick the root with
    the prefix's parity; no G1 subgroup check (mod.rs:40-42)."""
    batch = xs.shape[1]
    y2 = FQ.add(FQ.mul(FQ.sqr(xs), xs), FQ.const(C.B1, batch))
    y, is_res = FQ.sqrt(y2)
    parity = (_canonical(y)[0] & 1).astype(bool)
    want_odd = prefixes == 3
    y = FQ.select(parity ^ want_odd, FQ.neg(y), y)
    ok = is_res & ((prefixes == 2) | (prefixes == 3))
    pt = G.to_jacobian(G.G1, (xs, y), inf_mask=~ok)
    return pt, ok


def g2_decompress_batch(prefixes, xs, subgroup_check: bool = True):
    """prefixes: [B] int32 (0x0a/0x0b); xs: fq2 pair of [N, B] Montgomery
    batches.  Returns (jacobian_point, ok).

    Semantics match lib.rs:506-527: y = sqrt(x^3 + b2), pick y vs -y by
    the U512 (c1*q + c0) lexicographic order; subgroup check = r*P == inf
    (the twist has cofactor != 1; reference G2Params::check_order = true,
    mod.rs:469, enforced at AffineG2::new :104-107)."""
    batch = xs[0].shape[1]
    y2 = T.fq2_add(T.fq2_mul(T.fq2_sqr(xs), xs), T.fq2_const(C.B2, batch))
    y, is_res = T.fq2_sqrt(y2)
    y_neg = T.fq2_neg(y)

    # lexicographic order of the packed U512 value c1*q + c0: compare c1
    # first, then c0 (canonical limbs)
    c0, c1 = _canonical(y[0]), _canonical(y[1])
    n0, n1 = _canonical(y_neg[0]), _canonical(y_neg[1])
    eq1 = None
    for k in range(L.N_LIMBS):
        e = c1[k] == n1[k]
        eq1 = e if eq1 is None else (eq1 & e)
    y_gt = _limb_gt(c1, n1) | (eq1 & _limb_gt(c0, n0))

    want_larger = prefixes == 0x0B
    take_neg = y_gt ^ want_larger
    y = T.fq2_select(take_neg, y_neg, y)

    ok = is_res & ((prefixes == 0x0A) | (prefixes == 0x0B))
    pt = G.to_jacobian(G.G2, (xs, y), inf_mask=~ok)
    if subgroup_check:
        r_limbs = L.broadcast_const(
            np.asarray(L.limbs_from_int(C.R)), batch)
        in_sub = G.is_zero_point(
            G.G2, G.scalar_mul(G.G2, pt, r_limbs, num_bits=254))
        ok = ok & in_sub
        pt = G.to_jacobian(G.G2, (pt[0], pt[1]), inf_mask=~ok)
    return pt, ok


def parse_g1_compressed(blobs):
    """Host parser: list of 33-byte blobs -> (prefixes, xs, ok_host).

    Out-of-range x (>= q) and wrong lengths are marked invalid host-side
    (device sees x % q but ok_host forces the lane invalid)."""
    pre, xv, okh = [], [], []
    for b in blobs:
        b = bytes(b)
        good = len(b) == 33
        x = int.from_bytes(b[1:33], "big") if good else 0
        okh.append(good and x < C.Q)
        pre.append(b[0] if good else 0)
        xv.append(x % C.Q)
    return (jnp.asarray(np.asarray(pre, np.int32)),
            jnp.asarray(FQ.encode(xv)),
            jnp.asarray(np.asarray(okh)))


def parse_g2_compressed(blobs):
    """Host parser: list of 65-byte blobs -> (prefixes, fq2 xs, ok_host).

    The 64-byte payload decodes as the U512 value c1*q + c0 via divrem
    (lib.rs:260-267); encodings with quotient >= q are invalid."""
    pre, c0v, c1v, okh = [], [], [], []
    for b in blobs:
        b = bytes(b)
        good = len(b) == 65
        v = int.from_bytes(b[1:65], "big") if good else 0
        c1, c0 = divmod(v, C.Q)
        okh.append(good and c1 < C.Q)
        pre.append(b[0] if good else 0)
        c0v.append(c0 % C.Q)
        c1v.append(c1 % C.Q)
    return (jnp.asarray(np.asarray(pre, np.int32)),
            (jnp.asarray(FQ.encode(c0v)), jnp.asarray(FQ.encode(c1v))),
            jnp.asarray(np.asarray(okh)))


def g1_from_compressed_batch(blobs):
    """list of 33B blobs -> (jacobian batch, ok mask) — the batched
    device analogue of G1::from_compressed."""
    pre, xs, okh = parse_g1_compressed(blobs)
    pt, ok = g1_decompress_batch(pre, xs)
    ok = ok & okh
    return G.to_jacobian(G.G1, (pt[0], pt[1]), inf_mask=~ok), ok


def g2_from_compressed_batch(blobs, subgroup_check: bool = True):
    """list of 65B blobs -> (jacobian batch, ok mask)."""
    pre, xs, okh = parse_g2_compressed(blobs)
    pt, ok = g2_decompress_batch(pre, xs, subgroup_check=subgroup_check)
    ok = ok & okh
    return G.to_jacobian(G.G2, (pt[0], pt[1]), inf_mask=~ok), ok
