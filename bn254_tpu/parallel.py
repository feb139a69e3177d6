"""Multi-chip sharding for batched pairings and MSM (SURVEY.md §5; the
reference has no parallelism — these are the north-star capabilities
mapped onto a jax.sharding.Mesh).

Design: the only cross-device data in either workload is O(1) group/field
elements:

* sharded pairing_batch — pairs are sharded over the mesh's 'data' axis;
  each device runs its local Miller loops and product-reduces its shard to
  a single Fq12; the [ndev] partials travel over ICI with one all_gather,
  every device folds them (replicated), and ONE final exponentiation runs
  replicated.  This mirrors the reference's shared-final-exp semantics
  (groups/mod.rs:904-926) exactly.
* sharded MSM — points and scalars are sharded over 'data'; each device
  runs the full Pippenger kernel (bn254_tpu.msm) on its shard; the [ndev]
  partial sums are all_gathered and tree-folded on every device.

Both use shard_map so the per-shard program is exactly the single-chip
program (no resharding surprises), and both scale to multi-host meshes by
construction: the all_gather payload is constant-size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from . import groups as G
from . import msm as M
from . import pairing_jax as PJ
from . import tower as T

__all__ = ["make_mesh", "pairing_batch_sharded", "msm_sharded"]


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    """1-D mesh over all (or given) devices; the batch/point axis shards
    over it.  ICI-contiguous device order as given by jax.devices()."""
    import numpy as np

    devices = jax.devices() if devices is None else devices
    return Mesh(np.array(devices), (axis,))


def _fold_gathered(fold2, x, ndev_axis):
    """Tree-fold a leading gathered axis of length ndev (static)."""
    n = ndev_axis

    def take(i):
        return jax.tree.map(lambda a: a[i], x)

    acc = take(0)
    for i in range(1, n):
        acc = fold2(acc, take(i))
    return acc


def pairing_batch_sharded(mesh: Mesh, g1_points, g2_points, axis="data"):
    """Reduced product-of-pairings with the pair axis sharded over `mesh`.

    g1_points/g2_points: Jacobian device batches with the batch axis a
    multiple of the mesh size.  Returns a batch-1 Fq12 (replicated).
    """
    ndev = mesh.shape[axis]
    pspec = jax.tree.map(lambda _: P(None, axis), g1_points)
    qspec = jax.tree.map(lambda _: P(None, axis), g2_points)
    out_spec = jax.tree.map(lambda _: P(None, None),
                            T.fq12_ones(1))

    def local(p, q):
        from . import tape
        if tape.use_tape():
            # CPU mesh: per-device Miller product as a tape program, a
            # constant-size all_gather of [ndev] batch-1 partials, then
            # one fold+final-exp tape program (replicated).
            f = tape.miller_loop_batch(q, p)            # [.., 1]
            gathered = jax.lax.all_gather(f, axis)      # [ndev, .., 1]
            f = jax.tree.map(
                lambda a: jnp.moveaxis(a, 0, -1).reshape(a.shape[1], ndev),
                gathered)
            return tape.reduce_final_exp(f)
        # full-batch local product (lane 0): keeps every op on the fused
        # kernels on TPU; the all_gather payload is ndev local batches
        f = PJ.miller_loop_batch(q, p, keep_batch=True)
        gathered = jax.lax.all_gather(f, axis)          # [ndev, .., B]
        f = _fold_gathered(T.fq12_mul, gathered, ndev)
        out = T.fq12_final_exponentiation(f)
        return jax.tree.map(lambda a: a[..., :1], out)

    fn = shard_map(local, mesh=mesh, in_specs=(pspec, qspec),
                   out_specs=out_spec, check_rep=False)
    return fn(g1_points, g2_points)


def msm_sharded(mesh: Mesh, K, points, scalars, axis="data",
                c: int = M.WINDOW_BITS, tiles: int | None = None,
                num_bits: int = 256):
    """Sharded Pippenger MSM: point/scalar axis over `mesh`; one constant-
    size all_gather of per-device partial sums; replicated tree fold."""
    ndev = mesh.shape[axis]
    pspec = jax.tree.map(lambda _: P(None, axis), points)
    sspec = P(None, axis)
    out_spec = jax.tree.map(lambda _: P(None, None), points)

    def local(p, s):
        part = M.msm(K, p, s, c=c, tiles=tiles, num_bits=num_bits)
        gathered = jax.lax.all_gather(part, axis)        # [ndev, .., 1]
        return _fold_gathered(lambda a, b: G.add(K, a, b), gathered, ndev)

    fn = shard_map(local, mesh=mesh, in_specs=(pspec, sspec),
                   out_specs=out_spec, check_rep=False)
    return fn(points, scalars)
