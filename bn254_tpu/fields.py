"""Batched device prime fields Fq and Fr (SURVEY.md C2/C3; reference
/root/reference/src/fields/fp.rs).

An element batch is a uint32 array of shape [N_LIMBS, B] in Montgomery form
(R = 2^256, as the reference, fp.rs:166-222), fully reduced.  All ops are
branchless and jittable; data-dependent control flow of the reference
(binary-Euclid inversion arith.rs:324, early-out sqrt fp.rs:246-259) is
replaced by fixed-length ladders:

* inverse   = a^(q-2)      (Fermat; 0 -> 0 instead of None — callers that
                            need the reference's None use an is_zero mask)
* sqrt      = a^((q+1)/4) with a branchless Euler-criterion validity mask
* pow       = 256-step MSB-first square-and-multiply lax.scan
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from . import limbs as L
from .spec import constants as C

__all__ = ["FieldCtx", "FQ", "FR", "set_pallas"]

# Pallas kernel dispatch: None = auto (TPU backends only), True/False =
# forced.  The jnp path stays the reference; both are bit-identical.
_PALLAS_MODE = None
if os.environ.get("BN254_PALLAS") in ("0", "false"):
    _PALLAS_MODE = False
elif os.environ.get("BN254_PALLAS") in ("1", "true"):
    _PALLAS_MODE = True


def set_pallas(mode):
    """Force (True/False) or auto-select (None) the Pallas mul kernels."""
    global _PALLAS_MODE, _PALLAS_OK
    _PALLAS_MODE = mode
    _PALLAS_OK = None


_PALLAS_OK = None


def _tape_rec():
    """The active tape recorder, if the tape module is loaded and
    recording (see tape.py — the CPU instruction-tape engine)."""
    import sys

    m = sys.modules.get(__package__ + ".tape")
    return None if m is None else m._ACTIVE


def _is_reg(x) -> bool:
    return getattr(x, "_tape_reg", False)


def _use_pallas(batch: int) -> bool:
    global _PALLAS_OK
    if batch % 128:
        if _PALLAS_MODE is True:
            # forced-on must not silently diverge (ADVICE r01): Mosaic
            # kernels require batch % 128 == 0
            raise ValueError(
                f"BN254_PALLAS forced on, but batch {batch} is not a "
                "multiple of 128 (fused kernels need 128-lane tiles)")
        return False
    if _PALLAS_MODE is not None:
        if _PALLAS_MODE:
            from . import pallas_kernels as PK
            from . import pallas_fused as PF
            if not (PK.available() or PF._INTERPRET):
                raise RuntimeError(
                    "BN254_PALLAS forced on, but no TPU backend is "
                    "available (Mosaic kernels cannot lower on "
                    f"{__import__('jax').default_backend()}); use "
                    "pallas_fused.set_interpret(True) for CPU testing")
        return _PALLAS_MODE
    if _PALLAS_OK is None:
        from . import pallas_kernels as PK
        _PALLAS_OK = PK.available()
    return _PALLAS_OK


class FieldCtx:
    """Device context for one prime field: constants + vector ops."""

    def __init__(self, modulus: int):
        self.mod = L.Mod(modulus)
        self.p = modulus
        self.one_np = self.mod.encode(1)      # R mod q (Montgomery one)
        self.zero_np = L.limbs_from_int(0)

    # ---- host codecs ----
    def encode(self, vals) -> np.ndarray:
        """Iterable of canonical ints -> [N, B] Montgomery limbs."""
        return self.mod.encode_batch(list(vals))

    def decode(self, a) -> list:
        """[N, B] Montgomery limbs -> list of canonical ints."""
        return self.mod.decode_batch(a)

    # ---- device constants ----
    def zeros(self, batch: int):
        rec = _tape_rec()
        if rec is not None:
            self._assert_tape_field()
            return rec.zero()
        return L.zeros(batch)

    def ones(self, batch: int):
        rec = _tape_rec()
        if rec is not None:
            self._assert_tape_field()
            return rec.one()
        return L.broadcast_const(self.one_np, batch)

    def const(self, v: int, batch: int):
        """Canonical int -> broadcast Montgomery [N, B] device constant."""
        rec = _tape_rec()
        if rec is not None:
            self._assert_tape_field()
            return rec.const(v)
        return L.broadcast_const(self.mod.encode(v), batch)

    def _assert_tape_field(self):
        assert self.p == C.Q, "tape programs are Fq-only"

    # ---- arithmetic ----
    def add(self, a, b):
        if _is_reg(a):
            return a.rec.add(a, b)
        return L.add_mod(a, b, self.mod)

    def sub(self, a, b):
        if _is_reg(a):
            return a.rec.sub(a, b)
        return L.sub_mod(a, b, self.mod)

    def neg(self, a):
        if _is_reg(a):
            return a.rec.neg(a)
        return L.neg_mod(a, self.mod)

    def mul(self, a, b):
        if _is_reg(a):
            return a.rec.mul(a, b)
        if _use_pallas(a.shape[1]):
            from . import pallas_kernels as PK
            return PK.mont_mul(a, b, self.mod)
        return L.mont_mul(a, b, self.mod)

    def sqr(self, a):
        if _is_reg(a):
            return a.rec.sqr(a)
        if _use_pallas(a.shape[1]):
            from . import pallas_kernels as PK
            return PK.mont_sqr(a, self.mod)
        return L.mont_sqr(a, self.mod)

    def double(self, a):
        if _is_reg(a):
            return a.rec.add(a, a)
        return L.add_mod(a, a, self.mod)

    def is_zero(self, a):
        if _is_reg(a):
            return a.rec.is_zero(a)
        return L.is_zero(a)

    def eq(self, a, b):
        if _is_reg(a):
            return a.rec.eq(a, b)
        return L.eq(a, b)

    def select(self, mask, a, b):
        if _is_reg(mask):
            return mask.rec.select(mask, a, b)
        return L.select(mask, a, b)

    # ---- fixed-exponent power ladder ----
    def pow_const(self, a, e: int):
        """a^e for a STATIC exponent, via a lax.scan over its bits
        (MSB-first square-and-multiply, fields/mod.rs:35-46)."""
        if _is_reg(a):
            return a.rec.pow_const(a, e)
        if e == 0:
            return self.ones(a.shape[1])
        if _use_pallas(a.shape[1]) and self is FQ:
            # whole ladder as ONE kernel (254 fused steps) instead of a
            # scan of ~500 kernel launches
            from . import pallas_fused as PF
            return PF.fq_pow(a, e)
        bits = np.array(
            [(e >> i) & 1 for i in reversed(range(e.bit_length()))],
            dtype=np.bool_,
        )
        one = self.ones(a.shape[1])

        def body(res, bit):
            res = self.sqr(res)
            res = self.select(
                jnp.broadcast_to(bit, res.shape[1:]), self.mul(res, a), res
            )
            return res, None

        res, _ = jax.lax.scan(body, one, jnp.asarray(bits))
        return res

    def inv(self, a):
        """Fermat inverse a^(q-2); maps 0 -> 0 (branchless).

        Numerically identical to the reference's Euclid+R^3 path
        (fp.rs:108-117) for nonzero inputs.
        """
        return self.pow_const(a, self.p - 2)

    def sqrt(self, a):
        """(root, ok_mask): root of a if a is a QR else undefined; only for
        q = 3 mod 4 (fp.rs:246-259)."""
        assert self.p % 4 == 3
        a1 = self.pow_const(a, (self.p - 3) // 4)
        a1a = self.mul(a1, a)          # a^((q+1)/4)
        a0 = self.mul(a1, a1a)         # a^((q-1)/2): Euler criterion
        batch = a.shape[1]
        is_nonres = self.eq(a0, self.const(self.p - 1, batch))
        return a1a, ~is_nonres


FQ = FieldCtx(C.Q)
FR = FieldCtx(C.R)
