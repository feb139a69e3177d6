"""bn254_tpu — a TPU-native BN254 (alt_bn128) pairing library.

Built from scratch in JAX/XLA/Pallas with the same capabilities (and
bit-exact outputs) as the `substrate-bn` Rust crate:

* host scalar API (this module's re-exports): Fr/Fq/Fq2/G1/G2/Gt,
  pairing, pairing_batch, miller_loop_batch, byte & compressed codecs —
  exact Python-int engine (`bn254_tpu.spec`);
* batched device path: `bn254_tpu.fields` / `bn254_tpu.groups` /
  `bn254_tpu.pairing_jax` / `bn254_tpu.msm` — Montgomery limb arithmetic in
  16x16-bit uint lanes, branchless group law, scanned Miller loop, and
  Pippenger MSM, all jittable and shardable over a `jax.sharding.Mesh`
  (`bn254_tpu.parallel`).

JAX is imported lazily: the scalar API works without touching the device.
"""

from .api import (  # noqa: F401
    Fr, Fq, Fq2, G1, G2, AffineG1, AffineG2, Gt,
    pairing, pairing_batch, miller_loop_batch,
)
from . import errors  # noqa: F401
from .errors import (  # noqa: F401
    BNError, FieldError, CurveError, GroupError,
)

__version__ = "0.1.0"
