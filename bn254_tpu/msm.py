"""Pippenger multi-scalar multiplication on TPU (north-star capability;
no equivalent exists in the reference — see SURVEY.md §2 note and §7
phase 7).

Two designs live here:

* **Fused mega-kernel** (TPU default, `_msm_fused` +
  `pallas_fused.msm_accumulate`): grid (windows x point tiles), each
  window's bucket block resident in VMEM, one-hot select accumulation
  with the mixed-affine madd, in-kernel running-sum reduction.  Chosen
  because XLA lowers any random bucket access — regardless of layout —
  to one DMA per row (measured 94% of MSM wall time at 2^18,
  scripts/bench_msm.py); keeping the "scatter" on the vector datapath
  as static selects removes it entirely.  2^20 G1 points in ~0.7 s on a
  v5e (round 2).
* **Scan design** (CPU/tape and the tile-invariance tests), described
  below:

* Scalars are split into W = ceil(256/c) windows of c bits.
* The point set is reshaped into T parallel tiles.  ALL W windows are
  processed simultaneously by folding the window axis into the parallel
  batch axis: the device holds W*T private bucket arrays of 2^c Jacobian
  accumulators, and one lax.scan of n/T steps feeds each incoming point
  tile to every window's buckets at once (one flat gather + one
  [W*T]-wide branchless add + one flat scatter per step; bucket indices
  are unique within a step so no collision handling is needed).
* Bucket reduction is the classical running-sum (sum_b b*B_b via suffix
  accumulation): a single 2^c-1-step scan of [W*T]-wide adds; bucket 0 is
  naturally excluded.
* Windows then combine by Horner (c doublings between window partials,
  high window first) on [T]-wide batches, and a log2(T) tree folds the
  tiles.

Sequential depth: n/T + 2^c + c*(W-1) + log2(T) batched group ops, with
W*T-wide data parallelism in the two dominant scans.  All group ops are
the branchless unified add/double from bn254_tpu.groups, so duplicate
points, infinities, and P + (-P) inside a bucket need no control flow.

Multi-host sharding lives in bn254_tpu.parallel (shard the point axis;
each device runs this kernel on its shard; partials fold over an
all_gather).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import groups as G
from . import limbs as L

__all__ = ["msm", "WINDOW_BITS"]

WINDOW_BITS = 8  # 2^8 buckets per (window, tile): good VMEM/depth balance


def _all_digits(scalars, c: int, nwindows: int):
    """All base-2^c digits of each scalar -> [W, B] int32.

    scalars: canonical limb array [N_LIMBS, B] (16-bit limbs); c must
    divide LIMB_BITS.
    """
    assert L.LIMB_BITS % c == 0, "window size must divide the limb width"
    per_limb = L.LIMB_BITS // c
    rows = []
    for w in range(nwindows):
        limb = scalars[(w * c) // L.LIMB_BITS]
        sh = (w * c) % L.LIMB_BITS
        rows.append(((limb >> sh) & ((1 << c) - 1)).astype(jnp.int32))
    return jnp.stack(rows, axis=0)


def _digits_any_c(scalars, c: int, nwindows: int):
    """Base-2^c digits for any c (limb-straddling), [W, B] int32."""
    rows = []
    for w in range(nwindows):
        o = w * c
        l0, sh = divmod(o, L.LIMB_BITS)
        v = scalars[l0] >> sh
        if sh + c > L.LIMB_BITS and l0 + 1 < L.N_LIMBS:
            v = v | (scalars[l0 + 1] << (L.LIMB_BITS - sh))
        rows.append((v & ((1 << c) - 1)).astype(jnp.int32))
    return jnp.stack(rows, axis=0)


def _signed_digits(dgs, c: int):
    """Unsigned base-2^c digit rows [W, B] -> signed digits in
    [-(2^(c-1)-1), 2^(c-1)] via carry propagation (classic signed-digit
    Pippenger: halves the bucket count AND the kernel's one-hot select
    sweep; the kernel negates y for negative digits).  The caller must
    size W to cover num_bits + 1 bits so the top window absorbs the
    final carry."""
    half = 1 << (c - 1)
    rows = []
    carry = jnp.zeros(dgs.shape[1], jnp.int32)
    for w in range(dgs.shape[0]):
        d = dgs[w] + carry
        over = d > half
        rows.append(jnp.where(over, d - (1 << c), d))
        carry = over.astype(jnp.int32)
    return jnp.stack(rows)


def _msm_fused(K, points, scalars, c: int, num_bits: int = 254):
    """TPU path: one Pallas mega-kernel per MSM (VMEM-resident buckets,
    one-hot select accumulation over SIGNED digits — see
    pallas_fused.msm_accumulate).

    Window totals come back per lane (each lane an independent Pippenger
    tile); Horner combines windows at full lane width, then a log2 roll
    fold collapses lanes so every op stays on the fused kernels.
    num_bits: static bound on the scalar bit-length (254 for full Fr;
    GLV-decomposed scalars pass 128).
    """
    from . import pallas_fused as PF

    ncoords = 1 if K is G.G1 else 2
    n = K.batch_of(points[0])
    lanes = PF._TILE_S * 128
    pad = (-n) % lanes
    if pad:
        zp = G.zero_point(K, pad)
        points = jax.tree.map(
            lambda a, z: jnp.concatenate([a, z], axis=-1), points, zp)
        scalars = jnp.pad(scalars, ((0, 0), (0, pad)))
    W = (num_bits + 1 + c - 1) // c         # +1 bit: signed-carry headroom
    dgs = _signed_digits(_digits_any_c(scalars, c, W), c)
    # infinity inputs contribute nothing: send them to the discard bucket
    inf = G.is_zero_point(K, points)
    dgs = jnp.where(inf[None, :], 0, dgs)

    # batch-convert to affine for the kernel's mixed adds: ONE shared
    # Fermat inversion via prefix/suffix Montgomery product scans
    # (associative_scan: ~2 log2(n) batched muls) instead of a 254-step
    # pow ladder per element.  Infinity lanes get z := 1 (their affine
    # coords are garbage but their digits are already 0 -> discarded).
    batch = K.batch_of(points[0])
    ones_b = K.ones(batch)
    z = K.select(inf, ones_b, points[2])
    mulK = lambda a, b: K.mul(a, b)
    rev = lambda t: jax.tree.map(lambda a: jnp.flip(a, axis=-1), t)
    pre = jax.lax.associative_scan(mulK, z, axis=1)
    suf = rev(jax.lax.associative_scan(mulK, rev(z), axis=1))
    tinv = K.inv(jax.tree.map(lambda a: a[..., -1:], pre))
    tinv_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a, a.shape[:-1] + (batch,)), tinv)
    idx = jnp.arange(batch)
    pre1 = K.select(idx == 0, ones_b,
                    jax.tree.map(lambda a: jnp.roll(a, 1, axis=-1), pre))
    suf1 = K.select(idx == batch - 1, ones_b,
                    jax.tree.map(lambda a: jnp.roll(a, -1, axis=-1), suf))
    zinv = K.mul(K.mul(pre1, suf1), tinv_b)      # = z_i^-1
    zi2 = K.sqr(zinv)
    ax = K.mul(points[0], zi2)
    ay = K.mul(points[1], K.mul(zi2, zinv))

    packed = PF.pack((ax, ay))                    # [2*ncoords, N, n+pad]
    totals = PF.msm_accumulate(ncoords, packed, dgs, (1 << (c - 1)) + 1,
                               signed=True)
    # [W, 3*ncoords, N, lanes] -> per-window point pytrees
    def win(wi):
        t = totals[wi]
        if ncoords == 1:
            return (t[0], t[1], t[2])
        return ((t[0], t[1]), (t[2], t[3]), (t[4], t[5]))

    res = win(W - 1)
    for wi in range(W - 2, -1, -1):
        for _ in range(c):
            res = G.double(K, res)
        res = G.add(K, res, win(wi))

    k = 1
    while k < lanes:
        shifted = jax.tree.map(lambda a: jnp.roll(a, -k, axis=-1), res)
        res = G.add(K, res, shifted)
        k *= 2
    return jax.tree.map(lambda a: a[..., :1], res)


MSM_FUSED_WINDOW = {1: 6, 2: 5}  # VMEM bucket block ~12.5 MB per window


def msm(K, points, scalars, c: int = WINDOW_BITS, tiles: int | None = None,
        num_bits: int = 256):
    """sum_i scalars[i] * points[i] over group K -> batch-1 Jacobian point.

    points: Jacobian device batch ([.., n]); scalars: canonical limbs
    [N_LIMBS, n].  n must be a multiple of `tiles` (pad with infinity or
    zero-scalar pairs on the host if needed).

    num_bits is a STATIC bound on the scalar bit-length, trusted as-is:
    digit extraction stops there, so scalar bits at or above num_bits are
    silently dropped (the result is then sum (k_i mod 2^num_bits) * P_i).
    Pass the default 256 unless every scalar is known to fit the smaller
    bound (GLV half-scalars pass 128).
    """
    n = K.batch_of(points[0])
    from .fields import _use_pallas
    if tiles is None and _use_pallas(max(n, 256)) and n >= 1024:
        ncoords = 1 if K is G.G1 else 2
        return _msm_fused(K, points, scalars, MSM_FUSED_WINDOW[ncoords],
                          num_bits=min(num_bits, 254))
    if tiles is None:
        from .fields import _use_pallas
        if _use_pallas(n) and n % 128 == 0 and n >= 512:
            # fused-kernel path: keep every per-step batch >= 128 lanes so
            # the Horner/fold stages stay on the Pallas kernels
            tiles = 128
        else:
            # largest divisor of n that is <= min(64, n // 4), so the
            # default never trips the divisibility assert (ADVICE r01)
            cap = max(1, min(64, n // 4))
            tiles = max((d for d in range(1, cap + 1) if n % d == 0),
                        default=1)
    assert n % tiles == 0, "pad points to a multiple of the tile count"
    m = n // tiles
    nbuckets = 1 << c
    W = (num_bits + c - 1) // c
    WT = W * tiles

    # [.., n] -> [m, .., T] step-major point tiles
    pts = jax.tree.map(
        lambda a: jnp.moveaxis(a.reshape(a.shape[:-1] + (m, tiles)), -2, 0),
        points)

    # digits [W, n] -> [W, m, T] -> [m, W*T] (w-major within a step)
    dgs = (_all_digits if L.LIMB_BITS % c == 0
           else _digits_any_c)(scalars, c, W)
    dgs = jnp.moveaxis(dgs.reshape(W, m, tiles), 1, 0).reshape(m, WT)

    lane = jnp.arange(WT, dtype=jnp.int32) * nbuckets  # flat bucket bases

    # Bucket storage is ROW-PACKED: [WT * 2^c, n_leaves * N_LIMBS] uint32,
    # one bucket per row.  The per-step random access then becomes a row
    # gather / row scatter along the MAJOR axis with unique, sorted
    # indices (lane*2^c + digit is strictly increasing in lane) — the
    # layout TPUs handle natively (embedding-style row DMA).  The
    # limb-major compute layout is restored by a [B, L] <-> [L, B]
    # transpose per step, which is cheap next to the former minor-axis
    # scatter (measured 94% of MSM wall time, scripts/bench_msm.py).
    treedef = jax.tree.structure(points)
    nleaves = treedef.num_leaves

    def pack_rows(tree):
        # tree of [N_LIMBS, B] -> [B, nleaves*N_LIMBS]
        return jnp.concatenate(
            [a.T for a in jax.tree.leaves(tree)], axis=-1)

    def unpack_rows(rows):
        # [B, nleaves*N_LIMBS] -> tree of [N_LIMBS, B]
        parts = [rows[:, i * L.N_LIMBS:(i + 1) * L.N_LIMBS].T
                 for i in range(nleaves)]
        return jax.tree.unflatten(treedef, parts)

    def acc_body(buckets, step):
        pt, d = step                      # pt: [.., T]; d: [W*T]
        ptw = jax.tree.map(lambda a: jnp.tile(a, W), pt)   # [.., W*T]
        flat = lane + d
        cur = unpack_rows(buckets.at[flat].get(
            unique_indices=True, indices_are_sorted=True,
            mode="promise_in_bounds"))
        new = G.add(K, cur, ptw)
        buckets = buckets.at[flat].set(
            pack_rows(new), unique_indices=True, indices_are_sorted=True,
            mode="promise_in_bounds")
        return buckets, None

    bucket0 = pack_rows(G.zero_point(K, WT * nbuckets))
    buckets, _ = jax.lax.scan(acc_body, bucket0, (pts, dgs))

    # running-sum reduction over buckets 2^c-1 .. 1, all windows at once
    bviews = buckets.reshape(WT, nbuckets, -1)

    def red_body(carry, b):
        acc, total = carry
        bb = unpack_rows(
            jax.lax.dynamic_index_in_dim(bviews, b, axis=1, keepdims=False))
        acc = G.add(K, acc, bb)
        total = G.add(K, total, acc)
        return (acc, total), None

    init = (G.zero_point(K, WT), G.zero_point(K, WT))
    (_, totals), _ = jax.lax.scan(
        red_body, init, jnp.arange(nbuckets - 1, 0, -1, dtype=jnp.int32))

    # totals [.., W*T] -> per-window [.., T] partials; Horner high->low as a
    # scan (c doublings + 1 add per window)
    tview = jax.tree.map(
        lambda a: a.reshape(a.shape[:-1] + (W, tiles)), totals)

    def horner_body(res, w_idx):
        for _ in range(c):
            res = G.double(K, res)
        sw = jax.tree.map(lambda a: jnp.take(a, w_idx, axis=-2), tview)
        return G.add(K, res, sw), None

    result = jax.tree.map(lambda a: a[..., W - 1, :], tview)
    result, _ = jax.lax.scan(
        horner_body, result, jnp.arange(W - 2, -1, -1, dtype=jnp.int32))

    # fold tiles: log2(T) tree.  On the fused path with a power-of-two
    # tile count the batch stays CONSTANT (roll-and-add; lane 0 ends up
    # holding the total) so every add remains a fused kernel call.
    from .fields import _use_pallas

    p = result
    t = tiles
    if t > 1 and t & (t - 1) == 0 and _use_pallas(t):
        k = 1
        while k < t:
            shifted = jax.tree.map(lambda a: jnp.roll(a, -k, axis=-1), p)
            p = G.add(K, p, shifted)
            k *= 2
        return jax.tree.map(lambda a: a[..., :1], p)

    while t > 1:
        half = t // 2
        lo = jax.tree.map(lambda a: a[..., :half], p)
        hi = jax.tree.map(lambda a: a[..., half:2 * half], p)
        s = G.add(K, lo, hi)
        if t % 2:
            s = jax.tree.map(
                lambda x, a: jnp.concatenate([x, a[..., 2 * half:]], axis=-1),
                s, p)
            t = half + 1
        else:
            t = half
        p = s
    return p
