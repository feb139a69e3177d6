"""Pallas TPU kernels for the limb core (SURVEY.md §7 phase 1).

The jnp path in bn254_tpu.limbs expresses one Montgomery multiply as ~200
XLA ops with [N, N, B] intermediates; this module fuses the whole multiply
(schoolbook columns + 16 Montgomery reduction steps + carry normalization
+ conditional subtract) into ONE VMEM-resident kernel.

Layout: operands [N_LIMBS, B] are viewed as [N_LIMBS, B/128, 128] so each
limb row is a stack of native (8, 128) vregs; the grid tiles the batch.
All arithmetic is uint32 on the VPU; 16x16-bit limb products are exact in
32 bits and column sums stay < 2^23 (see limbs.py for the carry analysis).

The kernel is numerically identical to limbs.mont_mul (same algorithm,
HAC 14.32 / reference arith.rs:525-545) — asserted in tests in interpret
mode and against the spec oracle.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limbs as L

N = L.N_LIMBS
MASK = L.MASK
LB = L.LIMB_BITS

# batch tile (lanes) per grid step; rows of 128 lanes
_TILE_LANES = 1024
_SUB = _TILE_LANES // 128


def _mont_mul_body(al, bl, q, notq, qinv):
    """Shared mont-mul arithmetic on lists of per-limb vectors (any shape).

    q/notq: python-int limb tuples; qinv: python int.  Returns the output
    limb list.  Used by the Pallas kernel; identical math to
    limbs._mul_columns + _mont_reduce + cond_sub.
    """
    t = [None] * (2 * N)
    for i in range(N):
        ai = al[i]
        for j in range(N):
            p = ai * bl[j]
            lo = p & MASK
            hi = p >> LB
            k = i + j
            t[k] = lo if t[k] is None else t[k] + lo
            t[k + 1] = hi if t[k + 1] is None else t[k + 1] + hi
    for i in range(N):
        m = (t[i] * qinv) & MASK
        for j in range(N):
            p = m * q[j]
            t[i + j] = t[i + j] + (p & MASK)
            t[i + j + 1] = t[i + j + 1] + (p >> LB)
        t[i + 1] = t[i + 1] + (t[i] >> LB)
    # carry-normalize the high half
    limbs = []
    c = None
    for k in range(N):
        v = t[N + k] if c is None else t[N + k] + c
        limbs.append(v & MASK)
        c = v >> LB
    # conditional subtract q (borrow-free: r + ~q + 1, carry-out == r >= q)
    s = []
    c2 = None
    for k in range(N):
        v = limbs[k] + notq[k] + (1 if c2 is None else c2)
        s.append(v & MASK)
        c2 = v >> LB
    ge = c2 > 0
    return [jnp.where(ge, sk, lk) for sk, lk in zip(s, limbs)]


def _k_add(al, bl, q, notq):
    """Modular add on per-limb lists (same math as limbs.add_mod)."""
    s = []
    c = None
    for k in range(N):
        v = al[k] + bl[k] if c is None else al[k] + bl[k] + c
        s.append(v & MASK)
        c = v >> LB
    return _k_cond_sub(s, notq)


def _k_cond_sub(limbs, notq):
    s = []
    c2 = None
    for k in range(N):
        v = limbs[k] + notq[k] + (1 if c2 is None else c2)
        s.append(v & MASK)
        c2 = v >> LB
    ge = c2 > 0
    return [jnp.where(ge, sk, lk) for sk, lk in zip(s, limbs)]


def _k_sub(al, bl, q, notq):
    """a - b mod q via a + q + ~b + 1 (same math as limbs.sub_mod)."""
    s = []
    c = None
    for k in range(N):
        nb = (~bl[k]) & MASK
        v = al[k] + q[k] + nb + (1 if c is None else c)
        s.append(v & MASK)
        c = v >> LB
    return _k_cond_sub(s, notq)


def _k_neg(al, q, notq):
    s = []
    c = None
    for k in range(N):
        na = (~al[k]) & MASK
        v = q[k] + na + (1 if c is None else c)
        s.append(v & MASK)
        c = v >> LB
    return _k_cond_sub(s, notq)


def _k_double(al, q, notq):
    return _k_add(al, al, q, notq)


def _k_mul9(al, q, notq):
    d = _k_double(_k_double(_k_double(al, q, notq), q, notq), q, notq)
    return _k_add(d, al, q, notq)


def _kfq2_add(a, b, q, notq):
    return (_k_add(a[0], b[0], q, notq), _k_add(a[1], b[1], q, notq))


def _kfq2_sub(a, b, q, notq):
    return (_k_sub(a[0], b[0], q, notq), _k_sub(a[1], b[1], q, notq))


def _kfq2_mul(a, b, q, notq, qinv):
    """Karatsuba fq2 mul fused over limb lists (tower.fq2_mul formula)."""
    aa = _mont_mul_body(a[0], b[0], q, notq, qinv)
    bb = _mont_mul_body(a[1], b[1], q, notq, qinv)
    s1 = _k_add(a[0], a[1], q, notq)
    s2 = _k_add(b[0], b[1], q, notq)
    cross = _mont_mul_body(s1, s2, q, notq, qinv)
    c0 = _k_sub(aa, bb, q, notq)
    c1 = _k_sub(_k_sub(cross, aa, q, notq), bb, q, notq)
    return (c0, c1)


def _kfq2_sqr(a, q, notq, qinv):
    """Complex squaring fused (tower.fq2_sqr formula)."""
    ab = _mont_mul_body(a[0], a[1], q, notq, qinv)
    s = _k_add(a[0], a[1], q, notq)
    d = _k_sub(a[0], a[1], q, notq)
    t = _mont_mul_body(s, d, q, notq, qinv)
    return (t, _k_add(ab, ab, q, notq))


def _read_fq2(ref, base):
    return ([ref[base, j] for j in range(N)],
            [ref[base + 1, j] for j in range(N)])


def _write_fq2(ref, base, val):
    for j in range(N):
        ref[base, j] = val[0][j]
        ref[base + 1, j] = val[1][j]


def _fq2_mul_kernel(a_ref, b_ref, out_ref, *, q, notq, qinv):
    a = _read_fq2(a_ref, 0)
    b = _read_fq2(b_ref, 0)
    _write_fq2(out_ref, 0, _kfq2_mul(a, b, q, notq, qinv))


def _fq2_sqr_kernel(a_ref, out_ref, *, q, notq, qinv):
    a = _read_fq2(a_ref, 0)
    _write_fq2(out_ref, 0, _kfq2_sqr(a, q, notq, qinv))


@functools.lru_cache(maxsize=None)
def _fq2_call(modulus: int, batch: int, n_in: int, which: str,
              interpret: bool):
    mod = L.Mod(modulus)
    q = tuple(int(x) for x in mod.q_np)
    notq = tuple(int(x) for x in mod.notq_np)
    qinv = int(mod.qinv)

    sub = _SUB
    while batch % (sub * 128) and sub > 1:
        sub //= 2
    grid = batch // (sub * 128)

    kern = functools.partial(
        {"mul": _fq2_mul_kernel, "sqr": _fq2_sqr_kernel}[which],
        q=q, notq=notq, qinv=qinv)
    spec = pl.BlockSpec((2, N, sub, 128), lambda i: (0, 0, i, 0),
                        memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2, N, batch // 128, 128),
                                       jnp.uint32),
        grid=(grid,),
        in_specs=[spec] * n_in,
        out_specs=spec,
        interpret=interpret,
    )

    def pack(x):
        return jnp.stack(x, 0).reshape(2, N, batch // 128, 128)

    def unpack(y):
        y = y.reshape(2, N, batch)
        return (y[0], y[1])

    if which == "mul":
        return lambda a, b: unpack(call(pack(a), pack(b)))
    return lambda a: unpack(call(pack(a)))


def fq2_mul(a, b, mod: L.Mod, interpret: bool = False):
    """Fused Karatsuba Fq2 multiply (3 Montgomery muls, one kernel)."""
    batch = a[0].shape[1]
    assert batch % 128 == 0
    return _fq2_call(mod.modulus, batch, 2, "mul", interpret)(a, b)


def fq2_sqr(a, mod: L.Mod, interpret: bool = False):
    batch = a[0].shape[1]
    assert batch % 128 == 0
    return _fq2_call(mod.modulus, batch, 1, "sqr", interpret)(a)


def _mont_mul_kernel(a_ref, b_ref, out_ref, *, q, notq, qinv):
    al = [a_ref[i] for i in range(N)]
    bl = [b_ref[i] for i in range(N)]
    out = _mont_mul_body(al, bl, q, notq, qinv)
    for k in range(N):
        out_ref[k] = out[k]


def _mont_sqr_kernel(a_ref, out_ref, *, q, notq, qinv):
    al = [a_ref[i] for i in range(N)]
    out = _mont_mul_body(al, al, q, notq, qinv)
    for k in range(N):
        out_ref[k] = out[k]


@functools.lru_cache(maxsize=None)
def _mul_call(modulus: int, batch: int, interpret: bool):
    mod = L.Mod(modulus)
    q = tuple(int(x) for x in mod.q_np)
    notq = tuple(int(x) for x in mod.notq_np)
    qinv = int(mod.qinv)

    sub = _SUB
    while batch % (sub * 128) and sub > 1:
        sub //= 2
    grid = batch // (sub * 128)

    kern = functools.partial(_mont_mul_kernel, q=q, notq=notq, qinv=qinv)
    spec = pl.BlockSpec((N, sub, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, batch // 128, 128), jnp.uint32),
        grid=(grid,),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )

    def run(a, b):
        a3 = a.reshape(N, batch // 128, 128)
        b3 = b.reshape(N, batch // 128, 128)
        return call(a3, b3).reshape(N, batch)

    return run


@functools.lru_cache(maxsize=None)
def _sqr_call(modulus: int, batch: int, interpret: bool):
    mod = L.Mod(modulus)
    q = tuple(int(x) for x in mod.q_np)
    notq = tuple(int(x) for x in mod.notq_np)
    qinv = int(mod.qinv)

    sub = _SUB
    while batch % (sub * 128) and sub > 1:
        sub //= 2
    grid = batch // (sub * 128)

    kern = functools.partial(_mont_sqr_kernel, q=q, notq=notq, qinv=qinv)
    spec = pl.BlockSpec((N, sub, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, batch // 128, 128), jnp.uint32),
        grid=(grid,),
        in_specs=[spec],
        out_specs=spec,
        interpret=interpret,
    )

    def run(a):
        a3 = a.reshape(N, batch // 128, 128)
        return call(a3).reshape(N, batch)

    return run


def _default_interpret(interpret):
    """None -> follow pallas_fused's global interpret switch, so a forced
    Pallas run on CPU (set_pallas(True) + set_interpret(True)) routes the
    single-op kernels through the interpreter too."""
    if interpret is None:
        from . import pallas_fused as PF
        return PF._INTERPRET
    return interpret


def mont_mul(a, b, mod: L.Mod, interpret=None):
    """Pallas Montgomery multiply; batch must be a multiple of 128."""
    batch = a.shape[1]
    assert batch % 128 == 0, "pallas path needs batch % 128 == 0"
    return _mul_call(mod.modulus, batch, _default_interpret(interpret))(a, b)


def mont_sqr(a, mod: L.Mod, interpret=None):
    batch = a.shape[1]
    assert batch % 128 == 0, "pallas path needs batch % 128 == 0"
    return _sqr_call(mod.modulus, batch, _default_interpret(interpret))(a)


def available() -> bool:
    """True when a TPU-like backend is the default (Mosaic lowering)."""
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return "tpu" in plat or "axon" in plat
