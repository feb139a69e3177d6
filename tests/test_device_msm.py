"""Pippenger MSM + multi-chip sharding tests (north-star capabilities;
validated against the spec oracle, including shard-count invariance —
the analogue of the reference's batch-size invariance at 0/1/50 pairs)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bn254_tpu import groups as G
from bn254_tpu import limbs as L
from bn254_tpu import msm as M
from bn254_tpu import parallel as PAR
from bn254_tpu import pairing_jax as PJ
from bn254_tpu import tower as T
from bn254_tpu.spec import group as SG
from bn254_tpu.spec.constants import R

SEED = 0x357


def _spec_msm(pts, ks, ops):
    acc = SG.zero(ops)
    for p, k in zip(pts, ks):
        acc = SG.add(acc, SG.scalar_mul(p, k, ops), ops)
    return acc


def _rand_g1(rng, n):
    ops, gen = SG.G1_PARAMS[0], SG.G1_PARAMS[1]
    g = (gen[0], gen[1], ops.one)
    return [SG.scalar_mul(g, rng.randrange(1, R), ops) for _ in range(n)]


def test_msm_vs_spec():
    rng = random.Random(SEED)
    n = 16
    pts = _rand_g1(rng, n)
    ks = [rng.randrange(R) for _ in range(n)]
    ks[0] = 0                       # zero scalar
    pts[1] = SG.zero(SG.G1_PARAMS[0])  # infinity point
    ks[2] = ks[3] = 1               # duplicate small scalars
    pts[4] = pts[5]                 # duplicate points (same bucket adds)

    pd = G.encode_points(G.G1, pts)
    kd = jnp.asarray(L.stack_ints(ks))
    out = jax.jit(lambda p, k: M.msm(G.G1, p, k, tiles=4))(pd, kd)
    got = G.decode_points(G.G1, out)[0]
    assert SG.eq(got, _spec_msm(pts, ks, SG.G1_PARAMS[0]), SG.G1_PARAMS[0])


def test_msm_tile_invariance():
    """Same result for every tile decomposition (the parallel layout must
    not change the math)."""
    rng = random.Random(SEED + 1)
    n = 8
    pts = _rand_g1(rng, n)
    ks = [rng.randrange(R) for _ in range(n)]
    pd = G.encode_points(G.G1, pts)
    kd = jnp.asarray(L.stack_ints(ks))
    want = _spec_msm(pts, ks, SG.G1_PARAMS[0])
    for tiles in (1, 2, 8):
        out = jax.jit(lambda p, k: M.msm(G.G1, p, k, tiles=tiles))(pd, kd)
        got = G.decode_points(G.G1, out)[0]
        assert SG.eq(got, want, SG.G1_PARAMS[0]), f"tiles={tiles}"


def test_msm_g2():
    rng = random.Random(SEED + 2)
    ops, gen = SG.G2_PARAMS[0], SG.G2_PARAMS[1]
    g = (gen[0], gen[1], ops.one)
    n = 4
    pts = [SG.scalar_mul(g, rng.randrange(1, R), ops) for _ in range(n)]
    ks = [rng.randrange(R) for _ in range(n)]
    pd = G.encode_points(G.G2, pts)
    kd = jnp.asarray(L.stack_ints(ks))
    out = jax.jit(lambda p, k: M.msm(G.G2, p, k, tiles=2))(pd, kd)
    got = G.decode_points(G.G2, out)[0]
    assert SG.eq(got, _spec_msm(pts, ks, ops), ops)


def test_sharded_pairing_matches_single_device():
    """Shard-count invariance: same bits on 1 vs 8 devices."""
    rng = random.Random(SEED + 3)
    n = 8
    ps = _rand_g1(rng, n)
    ops2, gen2 = SG.G2_PARAMS[0], SG.G2_PARAMS[1]
    qs = [SG.scalar_mul((gen2[0], gen2[1], ops2.one), rng.randrange(1, R),
                        ops2) for _ in range(n)]
    ps[3] = SG.zero(SG.G1_PARAMS[0])   # infinity pair crosses a shard

    pd = G.encode_points(G.G1, ps)
    qd = G.encode_points(G.G2, qs)

    want = SG.pairing_batch(ps, qs)
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    mesh8 = PAR.make_mesh(jax.devices()[:8])
    out8 = PAR.pairing_batch_sharded(mesh8, pd, qd)
    assert T.fq12_decode(out8)[0] == want

    mesh1 = PAR.make_mesh(jax.devices()[:1])
    out1 = PAR.pairing_batch_sharded(mesh1, pd, qd)
    assert T.fq12_decode(out1)[0] == want


def test_signed_digits_reconstruct():
    """_signed_digits: digits in [-(2^(c-1)-1), 2^(c-1)] and
    sum(d_w * 2^(c*w)) == k exactly, incl. adversarial all-ones and
    near-R scalars."""
    rng = random.Random(SEED + 9)
    ks = [0, 1, (1 << 254) - 1, R - 1, R - 2,
          int("aa" * 32, 16) % (1 << 254)] + \
         [rng.randrange(R) for _ in range(58)]
    kd = jnp.asarray(L.stack_ints(ks))
    for c in (4, 5, 6):
        W = (254 + 1 + c - 1) // c
        dgs = np.asarray(M._signed_digits(M._digits_any_c(kd, c, W), c))
        half = 1 << (c - 1)
        assert dgs.min() >= -(half - 1) and dgs.max() <= half
        for j, k in enumerate(ks):
            got = sum(int(dgs[w, j]) << (c * w) for w in range(W))
            assert got == k, (c, j)


def test_sharded_msm_matches_single_device():
    rng = random.Random(SEED + 4)
    n = 16
    pts = _rand_g1(rng, n)
    ks = [rng.randrange(R) for _ in range(n)]
    pd = G.encode_points(G.G1, pts)
    kd = jnp.asarray(L.stack_ints(ks))
    want = _spec_msm(pts, ks, SG.G1_PARAMS[0])

    mesh = PAR.make_mesh(jax.devices()[:4])
    out = PAR.msm_sharded(mesh, G.G1, pd, kd, tiles=2)
    got = G.decode_points(G.G1, out)[0]
    assert SG.eq(got, want, SG.G1_PARAMS[0])
