"""The PRODUCTION branches of the sharded paths on the CPU mesh
(VERDICT r02 item 4).

The existing shard-count-invariance tests (test_device_msm) exercise
parallel.py's tape/CPU spelling; on a real pod the code that runs is the
NON-tape branch of pairing_batch_sharded (parallel.py:88-92 — full-batch
local Miller product, all_gather, fq12 fold, replicated final exp) and
_msm_fused under shard_map.  Both execute here:

* the pairing test turns the tape engine off (BN254_TAPE=0) so the
  per-shard program is the same jnp graph structure the TPU runs (with
  jnp limb ops standing in for the fused kernels);
* the MSM test forces the fused-MSM routing (set_pallas + interpret) with
  the mega-kernel swapped for its jnp reference — the kernel's own
  pallas_call plumbing runs in test_plumb_msm — so msm()'s fused-branch
  dispatch, padding/digits/affine glue, Horner and lane fold all execute
  under shard_map with the all_gather + tree fold on top.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np

from bn254_tpu import groups as G
from bn254_tpu import limbs as L
from bn254_tpu import msm as M
from bn254_tpu import parallel as PAR
from bn254_tpu import pallas_fused as PF
from bn254_tpu import tower as T
from bn254_tpu.spec import group as SG
from bn254_tpu.spec.constants import R

SEED = 0x9D0D


def _rand_g1(rng, n):
    ops, gen = SG.G1_PARAMS[0], SG.G1_PARAMS[1]
    g = (gen[0], gen[1], ops.one)
    return [SG.scalar_mul(g, rng.randrange(1, R), ops) for _ in range(n)]


def _rand_g2(rng, n):
    ops, gen = SG.G2_PARAMS[0], SG.G2_PARAMS[1]
    g = (gen[0], gen[1], ops.one)
    return [SG.scalar_mul(g, rng.randrange(1, R), ops) for _ in range(n)]


def test_pairing_batch_sharded_nontape(monkeypatch):
    """parallel.py's non-tape branch over a 2-device mesh, vs the spec
    oracle — including an infinity pair on one shard."""
    monkeypatch.setenv("BN254_TAPE", "0")
    rng = random.Random(SEED)
    n = 4
    ps = _rand_g1(rng, n)
    qs = _rand_g2(rng, n)
    ps[2] = SG.zero(SG.G1_PARAMS[0])          # infinity pair, shard 2

    pd = G.encode_points(G.G1, ps)
    qd = G.encode_points(G.G2, qs)
    want = SG.pairing_batch(ps, qs)

    assert len(jax.devices()) >= 2
    mesh = PAR.make_mesh(jax.devices()[:2])
    out = PAR.pairing_batch_sharded(mesh, pd, qd)
    assert T.fq12_decode(out)[0] == want


def _msm_accumulate_rows(ncoords, packed, digits, nb, signed=False):
    """Compile-friendly jnp reference of pallas_fused.msm_accumulate for
    use INSIDE one traced program (shard_map): row-packed buckets with a
    lax.scan over the point tiles (the one-hot python-loop reference in
    test_pallas_fused unrolls ~10^4 group ops and only works eagerly).
    Same lane tiling, same per-tile accumulation order, same running-sum
    reduction; digit-0 lanes write a trash row that is never read."""
    K = G.G1 if ncoords == 1 else G.G2
    W, n = digits.shape
    lanes = PF._TILE_S * 128
    m = n // lanes
    C3 = 3 * ncoords
    nrows = W * lanes * (nb - 1) + 1          # +1 trash row

    def tree_of(arr):
        ones = K.ones(arr.shape[-1])
        if ncoords == 1:
            return (arr[0], arr[1], ones)
        return ((arr[0], arr[1]), (arr[2], arr[3]), ones)

    def pack_rows(tree):
        return jnp.concatenate([a.T for a in jax.tree.leaves(tree)],
                               axis=-1)

    zero_tree = G.zero_point(K, nrows)

    def unpack_rows(rows):
        parts = [rows[:, i * L.N_LIMBS:(i + 1) * L.N_LIMBS].T
                 for i in range(2 * C3 // 2)]
        return jax.tree.unflatten(jax.tree.structure(zero_tree), parts)

    lane_base = (jnp.arange(W * lanes, dtype=jnp.int32) * (nb - 1))

    # [.., n] -> [m, .., lanes] step-major tiles; digits [W, n] -> [m, W*lanes]
    p_tiles = jnp.moveaxis(
        packed.reshape(packed.shape[:-1] + (m, lanes)), -2, 0)
    d_tiles = jnp.moveaxis(
        digits.reshape(W, m, lanes), 1, 0).reshape(m, W * lanes)

    def body(buckets, step):
        pt, d = step                           # pt [2C, N, lanes], d [W*lanes]
        q = tree_of(jnp.tile(pt, (1, 1, W)))   # [.., W*lanes]
        if signed:
            negm = d < 0
            q = (q[0], K.select(negm, K.neg(q[1]), q[1]), q[2])
            d = jnp.where(negm, -d, d)
        flat = jnp.where(d == 0, nrows - 1, lane_base + d - 1)
        cur = unpack_rows(buckets.at[flat].get(mode="promise_in_bounds"))
        new = G.add(K, cur, q)
        return buckets.at[flat].set(pack_rows(new),
                                    mode="promise_in_bounds"), None

    buckets0 = pack_rows(zero_tree)
    buckets, _ = jax.lax.scan(body, buckets0, (p_tiles, d_tiles))

    def red_body(carry, b):
        acc, tot = carry
        bb = unpack_rows(buckets.at[lane_base + b - 1].get(
            mode="promise_in_bounds"))
        acc = G.add(K, acc, bb)
        tot = G.add(K, tot, acc)
        return (acc, tot), None

    init = (G.zero_point(K, W * lanes), G.zero_point(K, W * lanes))
    (_, tot), _ = jax.lax.scan(
        red_body, init, jnp.arange(nb - 1, 0, -1, dtype=jnp.int32))
    stacked = jnp.stack(jax.tree.leaves(tot))  # [C3, N, W*lanes]
    return jnp.moveaxis(
        stacked.reshape(C3, L.N_LIMBS, W, lanes), 2, 0)


def test_msm_fused_sharded(monkeypatch):
    """msm()'s fused-branch routing under shard_map (the production MSM
    path): 2 devices x 1088 local points (pads to 9 lane tiles) through
    _msm_fused at the real window size, partials folded over the
    all_gather.  Scalars are bounded to 16 bits (num_bits=16) so the
    per-shard Horner stays a compilable CPU graph — the window/digit/
    padding/fold glue is identical at any num_bits."""
    monkeypatch.setattr(PF, "_TILE_S", 1)     # lanes=128 -> m=9 tiles
    monkeypatch.setattr(PF, "msm_accumulate", _msm_accumulate_rows)
    # route msm() straight to the fused glue (the _use_pallas gate needs
    # TPU/interpret kernels, which cannot live inside one traced CPU
    # graph; the gate itself is covered by the TPU-side oracle checks)
    monkeypatch.setattr(
        M, "msm",
        lambda K, p, s, c=M.WINDOW_BITS, tiles=None, num_bits=254:
        M._msm_fused(K, p, s, M.MSM_FUSED_WINDOW[1 if K is G.G1 else 2],
                     num_bits=min(num_bits, 254)))

    rng = random.Random(SEED + 1)
    n = 2176                                  # 1088 per device (>= fused min)
    kmax = 1 << 16
    # a small pool of points reused across lanes keeps host setup cheap
    ops = SG.G1_PARAMS[0]
    pool = _rand_g1(rng, 8)
    spts = [pool[i % 8] for i in range(n)]
    spts[5] = SG.zero(ops)                    # infinity input
    ks = [rng.randrange(kmax) for _ in range(n)]
    ks[0] = 0
    ks[1] = 1

    pd = G.encode_points(G.G1, spts)
    kd = jnp.asarray(L.stack_ints(ks))

    mesh = PAR.make_mesh(jax.devices()[:2])
    out = PAR.msm_sharded(mesh, G.G1, pd, kd, num_bits=16)

    # expected: spec MSM over the point pool (group the scalars per pool
    # index so only 8 spec scalar-muls run)
    sums = {}
    for i, (sp, kv) in enumerate(zip(spts, ks)):
        key = 8 if i == 5 else i % 8
        sums[key] = (sums.get(key, 0) + kv) % R
    want = SG.zero(ops)
    for key, kv in sums.items():
        if key == 8:
            continue                          # infinity contributes nothing
        want = SG.add(want, SG.scalar_mul(pool[key], kv, ops), ops)
    got = G.decode_points(G.G1, jax.tree.map(np.asarray, out))[0]
    assert SG.eq(got, want, ops)
