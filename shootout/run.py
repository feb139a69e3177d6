"""Shootout workload: 2 x N pairing accumulation with a commuting
cross-check (acc1 == acc2), the reference's end-to-end perf+correctness
harness (shootout/main.rs:5-29; timings recorded in shootout/README.md:
20,000 pairings in 208.8 s for the Rust crate, 123.7 s for libsnark).

Modes:
  python shootout/run.py            # native host engine (or spec), N=200
  python shootout/run.py 10000      # full reference workload size
  BN254_SHOOTOUT_DEVICE=1 ...       # batched device path: the scalar-mul
                                    # ladders and pairings run vectorized
                                    # on the TPU, same cross-check
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bn254_tpu import Fr, G1, G2, Gt, pairing  # noqa: E402


def host(n):
    c = Fr.from_str("1901").inverse()
    d = Fr.from_str("2344").inverse()

    def accumulate(s1, s2):
        a, b = G1.one(), G2.one()
        acc = Gt.one()
        for _ in range(n):
            acc = acc * pairing(a, b)
            a = a * s1
            b = b * s2
        return acc

    t0 = time.perf_counter()
    acc1 = accumulate(c, d)
    acc2 = accumulate(d, c)
    dt = time.perf_counter() - t0
    assert acc1 == acc2, "commuting accumulators disagree"
    return dt


def device(n):
    """Same workload batched: build the two point ladders host-side (cheap
    scalar muls), then run all 2n reduced pairings on the device and fold."""
    from bn254_tpu import batch as B

    c = Fr.from_str("1901").inverse()
    d = Fr.from_str("2344").inverse()

    def ladder(s1, s2):
        a, b = G1.one(), G2.one()
        pairs = []
        for _ in range(n):
            pairs.append((a, b))
            a = a * s1
            b = b * s2
        return pairs

    t0 = time.perf_counter()
    acc1 = B.pairing_batch(ladder(c, d))
    acc2 = B.pairing_batch(ladder(d, c))
    dt = time.perf_counter() - t0
    assert acc1 == acc2, "commuting accumulators disagree"
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    mode = "device" if os.environ.get("BN254_SHOOTOUT_DEVICE") else "host"
    dt = (device if mode == "device" else host)(n)
    total = 2 * n
    print(f"shootout[{mode}]: {total} pairings in {dt:.2f}s "
          f"= {total / dt:.1f} pairings/s (reference crate: 95.8/s)")


if __name__ == "__main__":
    main()
