"""ctypes bridge to the native host engine (native/bn254_host.c).

The native engine is the runtime-native counterpart of the reference
crate's Rust core: 64-bit-limb Montgomery arithmetic, the full tower,
group law, and pairing.  The scalar API (bn254_tpu.api) uses it as a
drop-in accelerator for the hot host-side operations when the shared
library is present; the pure-Python spec remains the semantic oracle and
fallback.

Build: `bash native/build.sh` (or: gcc -O3 -shared -fPIC
-o native/libbn254_host.so native/bn254_host.c).  All ABI values are
canonical little-endian u64 limbs.
"""

from __future__ import annotations

import ctypes
import os

_LIB = None
_WORDS = 4  # u64 limbs per 256-bit value


def _lib_path():
    return os.path.join(os.path.dirname(__file__), "..", "native",
                        "libbn254_host.so")


def load():
    """Load (and init) the native library; returns None if unavailable."""
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.abspath(_lib_path())
    if not os.path.exists(path) or os.environ.get("BN254_NO_NATIVE"):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.bn254_init()
    _LIB = lib
    return lib


def available() -> bool:
    return load() is not None


# ---- marshalling: canonical int <-> u64[4] little-endian ----

def _buf(n_words):
    return (ctypes.c_uint64 * n_words)()


def _put(buf, offset, v: int):
    for i in range(_WORDS):
        buf[offset + i] = (v >> (64 * i)) & 0xFFFFFFFFFFFFFFFF


def _get(buf, offset) -> int:
    return sum(int(buf[offset + i]) << (64 * i) for i in range(_WORDS))


def _put_fq2(buf, off, a):
    _put(buf, off, a[0])
    _put(buf, off + 4, a[1])


def _get_fq2(buf, off):
    return (_get(buf, off), _get(buf, off + 4))


def _put_g1(buf, off, p):
    _put(buf, off, p[0])
    _put(buf, off + 4, p[1])
    _put(buf, off + 8, p[2])


def _put_g2(buf, off, p):
    _put_fq2(buf, off, p[0])
    _put_fq2(buf, off + 8, p[1])
    _put_fq2(buf, off + 16, p[2])


def _get_g1(buf, off=0):
    return (_get(buf, off), _get(buf, off + 4), _get(buf, off + 8))


def _get_g2(buf, off=0):
    return (_get_fq2(buf, off), _get_fq2(buf, off + 8),
            _get_fq2(buf, off + 16))


def _get_fq12(buf):
    return ((_get_fq2(buf, 0), _get_fq2(buf, 8), _get_fq2(buf, 16)),
            (_get_fq2(buf, 24), _get_fq2(buf, 32), _get_fq2(buf, 40)))


def _put_fq12(buf, f):
    (c00, c01, c02), (c10, c11, c12) = f
    _put_fq2(buf, 0, c00)
    _put_fq2(buf, 8, c01)
    _put_fq2(buf, 16, c02)
    _put_fq2(buf, 24, c10)
    _put_fq2(buf, 32, c11)
    _put_fq2(buf, 40, c12)


# ---- operations (spec-pytree in, spec-pytree out) ----

def g1_scalar_mul(p, k: int):
    lib = load()
    pb, kb, ob = _buf(12), _buf(4), _buf(12)
    _put_g1(pb, 0, p)
    _put(kb, 0, k)
    lib.bn254_g1_mul(pb, kb, ob)
    return _get_g1(ob)


def g2_scalar_mul(p, k: int):
    lib = load()
    pb, kb, ob = _buf(24), _buf(4), _buf(24)
    _put_g2(pb, 0, p)
    _put(kb, 0, k)
    lib.bn254_g2_mul(pb, kb, ob)
    return _get_g2(ob)


def g1_add(p, q):
    lib = load()
    pb, qb, ob = _buf(12), _buf(12), _buf(12)
    _put_g1(pb, 0, p)
    _put_g1(qb, 0, q)
    lib.bn254_g1_add(pb, qb, ob)
    return _get_g1(ob)


def g2_add(p, q):
    lib = load()
    pb, qb, ob = _buf(24), _buf(24), _buf(24)
    _put_g2(pb, 0, p)
    _put_g2(qb, 0, q)
    lib.bn254_g2_add(pb, qb, ob)
    return _get_g2(ob)


def pairing(p, q):
    """Reduced pairing of spec Jacobian points -> spec fq12."""
    lib = load()
    pb, qb, ob = _buf(12), _buf(24), _buf(48)
    _put_g1(pb, 0, p)
    _put_g2(qb, 0, q)
    rc = lib.bn254_pairing(pb, qb, ob)
    assert rc == 0, f"native pairing rc={rc}"
    return _get_fq12(ob)


def pairing_batch(ps, qs):
    lib = load()
    n = len(ps)
    pb, qb, ob = _buf(12 * max(n, 1)), _buf(24 * max(n, 1)), _buf(48)
    for t, (p, q) in enumerate(zip(ps, qs)):
        _put_g1(pb, 12 * t, p)
        _put_g2(qb, 24 * t, q)
    rc = lib.bn254_pairing_batch(n, pb, qb, ob)
    assert rc == 0, f"native pairing_batch rc={rc}"
    return _get_fq12(ob)


def msm_g1(points, scalars):
    """Pippenger MSM over G1 in C (host oracle for the device MSM at
    scale): points = spec Jacobian triples, scalars = canonical ints."""
    lib = load()
    n = len(points)
    assert n == len(scalars)
    pb, kb, ob = _buf(12 * max(n, 1)), _buf(4 * max(n, 1)), _buf(12)
    for t, p in enumerate(points):
        _put_g1(pb, 12 * t, p)
    for t, k in enumerate(scalars):
        _put(kb, 4 * t, k)
    rc = lib.bn254_msm_g1(n, pb, kb, ob)
    assert rc == 0, f"native msm rc={rc}"
    return _get_g1(ob)


def msm_g2(points, scalars):
    """Pippenger MSM over G2 in C (see msm_g1)."""
    lib = load()
    n = len(points)
    assert n == len(scalars)
    pb, kb, ob = _buf(24 * max(n, 1)), _buf(4 * max(n, 1)), _buf(24)
    for t, p in enumerate(points):
        _put_g2(pb, 24 * t, p)
    for t, k in enumerate(scalars):
        _put(kb, 4 * t, k)
    rc = lib.bn254_msm_g2(n, pb, kb, ob)
    assert rc == 0, f"native msm rc={rc}"
    return _get_g2(ob)


def miller_loop_batch(qs, ps):
    """Returns the un-exponentiated fq12, or raises ValueError on an
    infinity point (lib.rs:625-633 semantics)."""
    lib = load()
    n = len(ps)
    pb, qb, ob = _buf(12 * max(n, 1)), _buf(24 * max(n, 1)), _buf(48)
    for t, (q, p) in enumerate(zip(qs, ps)):
        _put_g1(pb, 12 * t, p)
        _put_g2(qb, 24 * t, q)
    rc = lib.bn254_miller_loop_batch(n, qb, pb, ob)
    if rc == -1:
        raise ValueError("point at infinity")
    assert rc == 0, f"native miller_loop_batch rc={rc}"
    return _get_fq12(ob)


def fq12_pow(f, e: int):
    lib = load()
    fb, eb, ob = _buf(48), _buf(4), _buf(48)
    _put_fq12(fb, f)
    _put(eb, 0, e)
    lib.bn254_fq12_pow(fb, eb, ob)
    return _get_fq12(ob)


def final_exp(f):
    lib = load()
    fb, ob = _buf(48), _buf(48)
    _put_fq12(fb, f)
    lib.bn254_final_exp(fb, ob)
    return _get_fq12(ob)
