"""Radix-2^16 multi-limb modular arithmetic on uint32 lanes — the device
substrate of the library (SURVEY.md C1; reference /root/reference/src/arith.rs).

A 256-bit value is 16 little-endian 16-bit limbs stored in a uint32 array of
shape ``[N_LIMBS, B]`` — the limb axis LEADS and the batch axis B is LAST so
that on TPU each limb row occupies full 128-wide vector lanes (batch on
lanes, limbs on sublanes).  All values are kept fully carry-normalized
(every limb < 2^16) and reduced into [0, modulus).

Why 16-bit limbs in 32-bit lanes: the TPU VPU has no 64-bit integer multiply
and no carry flag.  16x16-bit products fit uint32 exactly; column sums in
the schoolbook/Montgomery accumulation stay < 2^23, far below the uint32
ceiling, so carries are propagated lazily with short fixed chains instead of
the reference's u128 adc/sbb chains (arith.rs:427-470).

The Montgomery radix here is R = 2^256, identical to the reference
(fp.rs:166-222), so Montgomery-domain test vectors carry over.

The multiply is SOS-style: a full 512-bit schoolbook product with the
256 partial products formed by one [N,N,B] broadcast multiply and reduced
along anti-diagonals with a single static gather (MXU/VPU-friendly, tiny
HLO), followed by 16 serial Montgomery reduction steps (HAC 14.32, matching
mul_reduce at arith.rs:525-545 but with vector columns instead of scalar
carry chains).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

LIMB_BITS = 16
N_LIMBS = 16
MASK = (1 << LIMB_BITS) - 1
NCOLS = 2 * N_LIMBS  # columns of the full product (the 2N-th is provably 0)

_U32 = np.uint32


# ---------------------------------------------------------------------------
# Host-side codecs (numpy; exact Python ints at the boundary)
# ---------------------------------------------------------------------------

def limbs_from_int(v: int, n: int = N_LIMBS) -> np.ndarray:
    """Little-endian 16-bit limb decomposition of a Python int -> [n] uint32."""
    assert 0 <= v < (1 << (LIMB_BITS * n))
    return np.array([(v >> (LIMB_BITS * k)) & MASK for k in range(n)], dtype=_U32)


def int_from_limbs(a) -> int:
    """Inverse of limbs_from_int; accepts any array-like of limbs."""
    a = np.asarray(a, dtype=np.uint64)
    return sum(int(x) << (LIMB_BITS * k) for k, x in enumerate(a))


def stack_ints(vals, n: int = N_LIMBS) -> np.ndarray:
    """[B] Python ints -> [n, B] uint32 limb array (batch last)."""
    return np.stack([limbs_from_int(v, n) for v in vals], axis=-1)


def ints_from_stack(a) -> list:
    """[n, B] limb array -> list of B Python ints."""
    a = np.asarray(a)
    return [int_from_limbs(a[:, i]) for i in range(a.shape[1])]


# ---------------------------------------------------------------------------
# Modulus context
# ---------------------------------------------------------------------------

class Mod:
    """Static per-modulus constants for the device kernels.

    Mirrors what the reference's field_impl! macro bakes per field
    (fp.rs:166-222): the modulus limbs, -modulus^-1 mod 2^LIMB_BITS (the
    per-limb Montgomery factor; the reference uses a single 128-bit `inv`,
    we use the low 16 bits per reduction step), and ~modulus for the
    borrow-free conditional subtract.
    """

    def __init__(self, modulus: int):
        self.modulus = modulus
        self.q_np = limbs_from_int(modulus)
        self.notq_np = np.array([(~int(x)) & MASK for x in self.q_np], dtype=_U32)
        self.qinv = _U32((-pow(modulus, -1, 1 << LIMB_BITS)) & MASK)
        self.r = (1 << (LIMB_BITS * N_LIMBS)) % modulus  # Montgomery R mod q
        self.r2 = (self.r * self.r) % modulus
        self.r_inv = pow(self.r, modulus - 2, modulus)
        # broadcast-ready [N, 1] device constants
        self.q = jnp.asarray(self.q_np)[:, None]
        self.notq = jnp.asarray(self.notq_np)[:, None]

    # -- host codecs (Montgomery domain) --
    def encode(self, v: int) -> np.ndarray:
        """Canonical int -> Montgomery-form limbs [N] (enter: *R mod q)."""
        return limbs_from_int((v % self.modulus) * self.r % self.modulus)

    def decode(self, a) -> int:
        """Montgomery-form limbs -> canonical int (exit: *R^-1 mod q)."""
        return int_from_limbs(np.asarray(a)) * self.r_inv % self.modulus

    def encode_batch(self, vals) -> np.ndarray:
        return np.stack([self.encode(v) for v in vals], axis=-1)

    def decode_batch(self, a) -> list:
        a = np.asarray(a)
        return [self.decode(a[:, i]) for i in range(a.shape[1])]


# ---------------------------------------------------------------------------
# Device kernels (jnp; fully branchless; batch axis last)
# ---------------------------------------------------------------------------
#
# Carry chains come in two spellings with identical values:
#  * unrolled Python loops (default; what the TPU traces between Pallas
#    kernels — cheap elementwise ops XLA fuses well), and
#  * lax.scan-based (CPU: collapses each op's HLO ~5x, which is what keeps
#    XLA:CPU's superlinear LLVM compile times tolerable for the
#    interpreter-mode test suite).

def _compact() -> bool:
    import jax

    try:
        return jax.default_backend() == "cpu"
    except Exception:
        return False


def _pick(compact):
    """Resolve an explicit compact= override (None -> backend default).

    The tape executor (tape.py) passes compact=False: its scan body holds
    ONE limb op, so the unrolled spelling compiles fine and avoids
    nested-scan step overhead."""
    return _compact() if compact is None else compact


def _carry_scan(cols, c0):
    """Sequential carry propagation over the limb axis via lax.scan.

    cols: [N, B] column sums; c0: [B] initial carry.  Returns
    ([N, B] limbs, [B] carry-out)."""
    import jax

    def body(c, col):
        v = col + c
        return v >> LIMB_BITS, v & MASK
    c, limbs = jax.lax.scan(body, c0, cols)
    return limbs, c


def _carry_norm(cols):
    """Propagate carries over a list of [B] column sums -> ([N] limbs, carry).

    Fixed 16-step chain; inputs may be up to ~2^23 per column.
    """
    limbs = []
    c = None
    for k in range(N_LIMBS):
        v = cols[k] if c is None else cols[k] + c
        limbs.append(v & MASK)
        c = v >> LIMB_BITS
    return limbs, c


def cond_sub(x, mod: Mod, compact=None):
    """x - q if x >= q else x, branchless (arith.rs:303-305 equivalent).

    Computes s = x + ~q + 1 (i.e. x - q mod 2^256); the carry-out of the
    16-limb chain is exactly the predicate x >= q.
    """
    notq = mod.notq
    if _pick(compact):
        s, c = _carry_scan(x + notq, jnp.ones_like(x[0]))
        return jnp.where((c > 0)[None], s, x)
    s = []
    c = jnp.ones_like(x[0])
    for k in range(N_LIMBS):
        v = x[k] + notq[k] + c
        s.append(v & MASK)
        c = v >> LIMB_BITS
    ge = (c > 0)[None]
    return jnp.where(ge, jnp.stack(s), x)


def add_mod(a, b, mod: Mod, compact=None):
    """(a + b) mod q; inputs reduced, output reduced (arith.rs:281-288)."""
    if _pick(compact):
        s, _ = _carry_scan(a + b, jnp.zeros_like(a[0]))
        return cond_sub(s, mod)
    s = []
    c = None
    for k in range(N_LIMBS):
        v = a[k] + b[k] if c is None else a[k] + b[k] + c
        s.append(v & MASK)
        c = v >> LIMB_BITS
    # a + b < 2q < 2^256, so the final carry is 0.
    return cond_sub(jnp.stack(s), mod, compact)


def sub_mod(a, b, mod: Mod, compact=None):
    """(a - b) mod q via a + q + ~b + 1 (mod 2^256) (arith.rs:290-297)."""
    if _pick(compact):
        s, _ = _carry_scan(a + mod.q + ((~b) & MASK),
                           jnp.ones_like(a[0]))
        return cond_sub(s, mod)
    s = []
    c = jnp.ones_like(a[0])
    for k in range(N_LIMBS):
        v = a[k] + mod.q[k] + ((~b[k]) & MASK) + c
        s.append(v & MASK)
        c = v >> LIMB_BITS
    # value = a + q - b in (0, 2q); drop the 2^256 wrap carry.
    return cond_sub(jnp.stack(s), mod, compact)


def neg_mod(a, mod: Mod):
    """(-a) mod q, branchless incl. a == 0 (q - 0 -> q -> cond_sub -> 0)."""
    if _compact():
        s, _ = _carry_scan(mod.q + ((~a) & MASK), jnp.ones_like(a[0]))
        return cond_sub(s, mod)
    s = []
    c = jnp.ones_like(a[0])
    for k in range(N_LIMBS):
        v = mod.q[k] + ((~a[k]) & MASK) + c
        s.append(v & MASK)
        c = v >> LIMB_BITS
    return cond_sub(jnp.stack(s), mod)


def _mul_columns(a, b):
    """Full 512-bit schoolbook product columns of two [N, B] operands.

    Returns [2N, B] uint32 column sums c_k = sum_{i+j=k} lo(a_i b_j)
    + sum_{i+j+1=k} hi(a_i b_j), each < 2^21.  The anti-diagonal reduction
    is one static gather + sum instead of 256 scalar MACs
    (mac_digit, arith.rs:473-522).
    """
    prod = a[:, None, :] * b[None, :, :]          # [N, N, B]
    lo = prod & MASK
    hi = prod >> LIMB_BITS
    padw = NCOLS - N_LIMBS
    lo_p = jnp.pad(lo, ((0, 0), (0, padw), (0, 0)))   # [N, 2N, B]
    hi_p = jnp.pad(hi, ((0, 0), (0, padw), (0, 0)))
    k = np.arange(NCOLS)[None, :]
    i = np.arange(N_LIMBS)[:, None]
    idx_lo = jnp.asarray(((k - i) % NCOLS).astype(np.int32))[:, :, None]
    idx_hi = jnp.asarray(((k - i - 1) % NCOLS).astype(np.int32))[:, :, None]
    # out-of-band offsets (>= N) land in the zero padding by construction
    cols = (jnp.take_along_axis(lo_p, idx_lo, axis=1).sum(axis=0) +
            jnp.take_along_axis(hi_p, idx_hi, axis=1).sum(axis=0))
    return cols                                    # [2N, B]


def _mont_reduce(cols, mod: Mod, compact=None):
    """Montgomery reduction of [2N, B] product columns -> [N, B] < q.

    16 serial steps of m = t_i * (-q^-1) mod 2^16; t += m*q << 16i; carry —
    the vector-column analogue of mul_reduce (arith.rs:525-545).
    """
    if _pick(compact):
        import jax

        B = cols.shape[1]
        q = mod.q

        def body(t, i):
            ti = jax.lax.dynamic_index_in_dim(t, i, 0, keepdims=False)
            m = (ti * mod.qinv) & MASK
            p = m[None, :] * q
            win = jax.lax.dynamic_slice(t, (i, 0), (N_LIMBS + 1, B))
            win = win.at[:N_LIMBS].add(p & MASK)
            win = win.at[1:N_LIMBS + 1].add(p >> LIMB_BITS)
            win = win.at[1].add(win[0] >> LIMB_BITS)
            return jax.lax.dynamic_update_slice(t, win, (i, 0)), None

        t, _ = jax.lax.scan(body, cols,
                            jnp.arange(N_LIMBS, dtype=jnp.int32))
        limbs, _ = _carry_scan(t[N_LIMBS:], jnp.zeros_like(t[0]))
        return cond_sub(limbs, mod)

    t = cols
    q = mod.q
    for i in range(N_LIMBS):
        m = (t[i] * mod.qinv) & MASK               # [B]
        p = m[None, :] * q                          # [N, B] 16x16 products
        hi_end = i + N_LIMBS + 1
        if hi_end <= NCOLS:
            t = t.at[i:i + N_LIMBS].add(p & MASK)
            t = t.at[i + 1:hi_end].add(p >> LIMB_BITS)
        else:  # final step: the topmost hi contribution provably carries to 0
            t = t.at[i:i + N_LIMBS].add(p & MASK)
            t = t.at[i + 1:NCOLS].add((p >> LIMB_BITS)[:N_LIMBS - 1])
        t = t.at[i + 1].add(t[i] >> LIMB_BITS)
    limbs, _c = _carry_norm([t[N_LIMBS + k] for k in range(N_LIMBS)])
    # result < 2q < 2^256 so the top carry is 0
    return cond_sub(jnp.stack(limbs), mod, compact)


def mont_mul(a, b, mod: Mod, compact=None):
    """Montgomery product abR^-1 mod q of reduced [N, B] operands."""
    return _mont_reduce(_mul_columns(a, b), mod, compact)


def mont_sqr(a, mod: Mod, compact=None):
    """Montgomery square (same cost as mul for now; symmetry TODO)."""
    return _mont_reduce(_mul_columns(a, a), mod, compact)


def is_zero(a):
    """[N, B] -> [B] bool."""
    return jnp.all(a == 0, axis=0)


def eq(a, b):
    """[N, B] x [N, B] -> [B] bool (values reduced => rep equality)."""
    return jnp.all(a == b, axis=0)


def select(mask, a, b):
    """Branchless per-batch-element select: mask [B] -> [N, B]."""
    return jnp.where(mask[None, :], a, b)


def zeros(batch: int):
    return jnp.zeros((N_LIMBS, batch), dtype=jnp.uint32)


def broadcast_const(limbs_np: np.ndarray, batch: int):
    """[N] host constant -> [N, B] device array."""
    return jnp.broadcast_to(jnp.asarray(limbs_np)[:, None], (N_LIMBS, batch))


def get_bit(a, k: int):
    """Bit k (little-endian) of each batch element -> [B] bool."""
    return ((a[k // LIMB_BITS] >> (k % LIMB_BITS)) & 1).astype(bool)
