"""High-level batched device API: drive the JAX/TPU path with the scalar
API's objects (Fr/G1/G2/Gt) without touching limb encodings.

This is the throughput interface the reference lacks: `pairing_batch` here
has the same semantics as the scalar `bn254_tpu.pairing_batch`
(lib.rs:615-623) but runs vectorized on the device, and `msm_g1`/`msm_g2`
are the Pippenger multi-scalar multiplications (north-star capability).

Jitted executables are cached per batch shape; pad batches to a few fixed
sizes in latency-sensitive callers to avoid recompiles.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from . import api as A
from . import groups as G
from . import limbs as L
from . import msm as M
from . import pairing_jax as PJ
from . import tower as T

__all__ = ["pairing_batch", "pairing_each", "msm_g1", "msm_g2",
           "scalar_mul_g1"]


def _g1_in(ps):
    return G.encode_points(G.G1, [p.p for p in ps])


def _g2_in(qs):
    return G.encode_points(G.G2, [q.p for q in qs])


def _scalars_in(ks):
    return jnp.asarray(L.stack_ints([k.v for k in ks]))


@lru_cache(maxsize=None)
def _jit_pairing_batch():
    return jax.jit(PJ.pairing_batch)


@lru_cache(maxsize=None)
def _jit_pairing_each():
    return jax.jit(PJ.pairing)


@lru_cache(maxsize=None)
def _jit_msm(kind: str, tiles):
    K = G.G1 if kind == "g1" else G.G2
    return jax.jit(lambda p, s: M.msm(K, p, s, tiles=tiles))


@lru_cache(maxsize=None)
def _jit_miller_batch():
    return jax.jit(lambda p, q: PJ.miller_loop_batch(q, p))


# Mosaic kernels recompile per batch shape (minutes over the tunnel), so
# big batches run as fixed-size chunks of one cached shape; the per-chunk
# Miller products (algebraically exact partials — the shared squaring
# chain is per chunk, matching mod.rs:609-640 semantics chunk-wise) are
# folded host-side and one final exponentiation finishes the product.
_CHUNK = 1024


def pairing_batch(pairs) -> "A.Gt":
    """Product of pairings with one shared final exponentiation
    (device analogue of lib.rs:615; silent infinity skip).

    pairs: iterable of (G1, G2) scalar-API objects."""
    import os

    pairs = list(pairs)
    if not pairs:
        return A.Gt.one()
    chunk = int(os.environ.get("BN254_BATCH_CHUNK", str(_CHUNK)))
    if len(pairs) <= chunk:
        p = _g1_in([a for a, _ in pairs])
        q = _g2_in([b for _, b in pairs])
        out = _jit_pairing_batch()(p, q)
        return A.Gt(T.fq12_decode(out)[0])

    from .spec import field as SF

    acc = None
    for i in range(0, len(pairs), chunk):
        cp = pairs[i:i + chunk]
        pad = chunk - len(cp)
        # pad with infinity pairs — skipped silently, exactly like the
        # scalar pairing_batch (mod.rs:911-920)
        p = G.encode_points(G.G1, [a.p for a, _ in cp] + [None] * pad)
        q = G.encode_points(G.G2, [b.p for _, b in cp] + [None] * pad)
        f = T.fq12_decode(_jit_miller_batch()(p, q))[0]
        acc = f if acc is None else SF.fq12_mul(acc, f)
    return A.Gt(SF.fq12_final_exponentiation(acc))


def pairing_each(pairs) -> list:
    """Independent reduced pairings, vectorized over the batch."""
    pairs = list(pairs)
    if not pairs:
        return []
    p = _g1_in([a for a, _ in pairs])
    q = _g2_in([b for _, b in pairs])
    out = _jit_pairing_each()(p, q)
    return [A.Gt(v) for v in T.fq12_decode(out)]


def _msm(kind, wrap, encode, points, scalars, tiles):
    points = list(points)
    scalars = list(scalars)
    assert len(points) == len(scalars) and points
    if tiles is None:
        # let msm() pick its path: the fused VMEM-bucket mega-kernel on
        # TPU (pads internally), the scan design elsewhere
        pass
    else:
        while len(points) % tiles:
            points.append(type(points[0]).zero())
            scalars.append(A.Fr.zero())
    out = _jit_msm(kind, tiles)(encode(points), _scalars_in(scalars))
    K = G.G1 if kind == "g1" else G.G2
    return wrap(G.decode_points(K, out)[0])


def msm_g1(points, scalars, tiles=None) -> "A.G1":
    """sum_i scalars[i]*points[i] on device (Pippenger)."""
    return _msm("g1", A.G1._wrap, _g1_in, points, scalars, tiles)


def msm_g2(points, scalars, tiles=None) -> "A.G2":
    return _msm("g2", A.G2._wrap, _g2_in, points, scalars, tiles)


@lru_cache(maxsize=None)
def _jit_smul(kind):
    # GLV joint ladder: 128 steps instead of 256 (same group element as
    # the double-and-add oracle; parity tested in tests/test_glv.py)
    from . import glv

    K = G.G1 if kind == "g1" else G.G2
    return jax.jit(lambda p, s: glv.scalar_mul_glv(K, p, s))


def scalar_mul_g1(points, scalars) -> list:
    """Batched independent scalar multiplications."""
    points = list(points)
    out = _jit_smul("g1")(_g1_in(points), _scalars_in(list(scalars)))
    return [A.G1._wrap(p) for p in G.decode_points(G.G1, out)]
