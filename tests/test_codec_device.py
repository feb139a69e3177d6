"""Batched device decompression vs the host codec (exact reference
semantics, lib.rs:359-376 / :506-527), including the golden hex vectors
and the invalid-input taxonomy as mask-offs."""

import random

import numpy as np
import jax
import jax.numpy as jnp

from bn254_tpu import codec_device as CD
from bn254_tpu import groups as G
from bn254_tpu.spec import codec as SC
from bn254_tpu.spec import group as SG
from bn254_tpu.spec.constants import Q
from bn254_tpu.errors import BNError

import golden


def _host_g1(b):
    try:
        return SC.g1_from_compressed(b)
    except BNError:
        return None


def _host_g2(b):
    try:
        return SC.g2_from_compressed(b)
    except BNError:
        return None


def _rand_g1_blobs(rng, n):
    ops, gen = SG.G1_PARAMS[0], SG.G1_PARAMS[1]
    blobs = []
    for i in range(n):
        p = SG.scalar_mul((gen[0], gen[1], ops.one),
                          rng.randrange(1, 1 << 60), ops)
        blobs.append(SC.g1_to_compressed(SG.to_affine(p, ops)))
    return blobs


def test_g1_batch_matches_host():
    rng = random.Random(0xC0DEC)
    blobs = _rand_g1_blobs(rng, 12)
    blobs.append(bytes.fromhex(golden.G1_COMPRESSED_HEX))
    blobs.append(bytes([0x05]) + blobs[0][1:])          # bad prefix
    blobs.append(bytes([0x02]) + b"\x00" * 32)          # non-residue x=0
    blobs.append(bytes([0x02]) + (Q).to_bytes(32, "big"))  # x >= q
    pts, ok = CD.g1_from_compressed_batch(blobs)
    ok = np.asarray(ok)
    dec = G.decode_points(G.G1, jax.tree.map(np.asarray, pts))
    ops = SG.G1_PARAMS[0]
    for i, b in enumerate(blobs):
        want = _host_g1(b)
        assert bool(ok[i]) == (want is not None), i
        if want is not None:
            wx, wy = want
            assert SG.eq(dec[i], (wx, wy, 1), ops), i


def test_g2_batch_matches_host():
    rng = random.Random(0xC0DE2)
    ops, gen = SG.G2_PARAMS[0], SG.G2_PARAMS[1]
    blobs = []
    for i in range(6):
        p = SG.scalar_mul((gen[0], gen[1], ops.one),
                          rng.randrange(1, 1 << 60), ops)
        blobs.append(SC.g2_to_compressed(SG.to_affine(p, ops)))
    blobs.append(bytes.fromhex(golden.G2_COMPRESSED_HEX))
    blobs.append(bytes.fromhex(golden.G2_COMPRESSED_HEX_REFLECT))
    blobs.append(bytes.fromhex(golden.G2_COMPRESSED_HEX_BADPREFIX))
    pts, ok = CD.g2_from_compressed_batch(blobs)
    ok = np.asarray(ok)
    dec = G.decode_points(G.G2, jax.tree.map(np.asarray, pts))
    for i, b in enumerate(blobs):
        want = _host_g2(b)
        assert bool(ok[i]) == (want is not None), i
        if want is not None:
            wx, wy = want
            assert SG.eq(dec[i], (wx, wy, ops.one), ops), i
