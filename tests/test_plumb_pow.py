"""Interpret-mode pallas_call plumbing tests for the whole-ladder pow
kernels (VERDICT r02 item 5).

The emulated-KCtx tests in test_pallas_fused.py pin every FORMULA; these
run the actual `pallas_call` (SMEM digit schedule, fori_loop state machine,
pl.when gating, BlockSpecs, grid) through the Pallas interpreter at
minimum shapes, so a plumbing regression fails in CI instead of only on
the next TPU golden run.

Interpreter compile cost is ~6.6 s per Montgomery mul of kernel body on
this class of CPU box; the schedules here are cut to the minimum that
still exercises every digit kind.  First run is minutes (persistently
cached by tests/conftest.py); warm runs are seconds.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np

from bn254_tpu import pallas_fused as PF
from bn254_tpu import tower as T
from bn254_tpu.fields import FQ
from bn254_tpu.spec import constants as C

SEED = 0x9087
B = 128


def _eq_tree(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_fq_pow_kernel_interpret():
    """fq_pow's ladder pallas_call (SMEM bits + fori + pl.when) vs exact
    integer pow.  e = 5 -> digit schedule [0, 1]: one squaring-only step
    and one squaring+multiply step."""
    rng = random.Random(SEED)
    vals = [rng.randrange(C.Q) for _ in range(B - 3)] + [0, 1, C.Q - 1]
    a = jnp.asarray(FQ.encode(vals))
    PF.set_interpret(True)
    try:
        got = PF.fq_pow(a, 5)
    finally:
        PF.set_interpret(False)
    assert FQ.decode(got) == [pow(v, 5, C.Q) for v in vals]


def test_fq12_cyc_pow_kernel_interpret():
    """The cyclotomic-pow ladder pallas_call with a 3-digit schedule
    [1, 0, 2] — exercising the multiply-by-base digit, the squaring-only
    digit, AND the multiply-by-conjugate digit (NAF -1) — vs the same
    digit schedule spelled with the jnp tower ops.

    The formula parity of cyclotomic_sqr/mul holds for ARBITRARY Fq12
    inputs (both paths compute the same formulas), so random operands are
    valid here even though -1 digits are only mathematically a^-1 on
    cyclotomic-subgroup elements."""
    rng = random.Random(SEED + 1)

    def rf12():
        def rf2():
            return (rng.randrange(C.Q), rng.randrange(C.Q))
        return (tuple(rf2() for _ in range(3)),
                tuple(rf2() for _ in range(3)))

    a = jax.tree.map(jnp.asarray, T.fq12_encode([rf12() for _ in range(B)]))
    digits = np.array([[1], [0], [2]], dtype=np.int32)

    PF.set_interpret(True)
    try:
        got = PF.unpack_fq12(
            PF._pow_call("fq12_cyc_pow", B, len(digits))(PF.pack(a), digits))
    finally:
        PF.set_interpret(False)

    conj = T.fq12_conj(a)
    want = a
    for d in digits[:, 0]:
        want = T.fq12_cyclotomic_sqr(want)
        if d == 1:
            want = T.fq12_mul(want, a)
        elif d == 2:
            want = T.fq12_mul(want, conj)
    _eq_tree(got, want)
