"""bn254_tpu.spec — pure-Python reference implementation ("the spec").

Exact-integer oracle for the JAX/Pallas device path, and the engine behind
the host-side scalar API.  Importable without JAX.
"""

from . import constants, field, group, codec  # noqa: F401
