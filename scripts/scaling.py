"""1->N multi-chip scaling-efficiency harness (VERDICT r01 item 9;
north-star: >=80% efficiency at 4 hosts on the 2^20-point MSM).

Runs the sharded pairing product and sharded Pippenger MSM on meshes of
1, 2, 4, ... devices at FIXED TOTAL WORK (strong scaling), times each, and
writes benches/scaling.json:

    efficiency(N) = t(1) / (N * t(N))

On a real pod this is one command (devices come from jax.devices()).
Without TPU hardware it runs on the virtual CPU mesh
(--xla_force_host_platform_device_count) — the collective/sharding code
paths are identical; only the interconnect is fake, so CPU-mesh numbers
validate the harness and the communication structure, not ICI bandwidth.

    python scripts/scaling.py [--pairs 64] [--msm 4096] [--devices 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=64,
                    help="total pairing count (sharded over the mesh)")
    ap.add_argument("--msm", type=int, default=4096,
                    help="total MSM point count")
    ap.add_argument("--devices", type=int, default=0,
                    help="force a virtual CPU mesh of this many devices "
                         "(0 = use the real platform's devices)")
    ap.add_argument("--msm-tiles", type=int, default=8,
                    help="parallel tile width of the per-device scan MSM "
                         "(128 keeps the 2^20 CPU-mesh run tractable)")
    ap.add_argument("--msm-window", type=int, default=0,
                    help="Pippenger window bits (0 = library default)")
    ap.add_argument("--no-tape", action="store_true",
                    help="disable the CPU tape engine so the per-shard "
                         "program is the production jnp/scan structure")
    ap.add_argument("--out", default=os.path.join(REPO, "benches",
                                                  "scaling.json"))
    args = ap.parse_args()

    if args.no_tape:
        os.environ["BN254_TAPE"] = "0"

    if args.devices:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   " --xla_force_host_platform_device_count"
                                   f"={args.devices}").strip()
    import jax
    if args.devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/bn254_jax_cache_scaling")
    import jax.numpy as jnp
    import numpy as np

    from bn254_tpu import groups as G
    from bn254_tpu import msm as M
    from bn254_tpu import parallel as PAR
    from bn254_tpu.fields import FR
    from bn254_tpu.spec.constants import R

    devs = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devs)]
    print(f"platform={devs[0].platform} devices={len(devs)} sizes={sizes}")

    rng = np.random.default_rng(7)

    def rand_fr(n):
        return jnp.asarray(
            FR.encode([int(rng.integers(1, 1 << 62)) for _ in range(n)]))

    # ---- workloads (total work constant across mesh sizes) ----------------
    npairs, nmsm = args.pairs, args.msm
    g1 = G.scalar_mul(G.G1, G.generator(G.G1, npairs), rand_fr(npairs))
    g2 = G.scalar_mul(G.G2, G.generator(G.G2, npairs), rand_fr(npairs))
    pts = G.scalar_mul(G.G1, G.generator(G.G1, nmsm), rand_fr(nmsm))
    scl = rand_fr(nmsm)
    jax.block_until_ready((g1, g2, pts, scl))

    results = {"platform": devs[0].platform, "ndev_avail": len(devs),
               "pairs": npairs, "msm_points": nmsm, "runs": {}}

    def bench(name, build):
        times = {}
        for n in sizes:
            mesh = PAR.make_mesh(devs[:n])
            fn = build(mesh)
            out = jax.block_until_ready(fn())       # compile + warm
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                out = jax.block_until_ready(fn())
            dt = (time.perf_counter() - t0) / reps
            eff = times.get(1, dt) / (n * dt)
            times[n] = dt
            print(f"{name:8s} ndev={n:2d}  {dt*1e3:9.1f} ms"
                  f"  speedup={times[1]/dt:5.2f}x  eff={eff:5.1%}",
                  flush=True)
            results["runs"].setdefault(name, {})[str(n)] = {
                "seconds": dt,
                "speedup": times[1] / dt,
                "efficiency": times[1] / (n * dt)}
            # write incrementally: long CPU-mesh runs can hit timeouts
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            with open(args.out, "w") as fh:
                json.dump(results, fh, indent=1)

    mkw = dict(tiles=args.msm_tiles)
    if args.msm_window:
        mkw["c"] = args.msm_window
    bench("pairing",
          lambda mesh: lambda: PAR.pairing_batch_sharded(mesh, g1, g2))
    bench("msm",
          lambda mesh: lambda: PAR.msm_sharded(mesh, G.G1, pts, scl,
                                               **mkw))

    print("wrote", args.out)


if __name__ == "__main__":
    main()
