"""Three-party Diffie-Hellman key exchange over G1 (two rounds).

Executable acceptance test of scalar multiplication end to end; the
behavioral model is the reference's examples/dh.rs:6-31.
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bn254_tpu import Fr, G1


def main():
    alice_sk = Fr.random()
    bob_sk = Fr.random()
    carol_sk = Fr.random()

    alice_pk = G1.one() * alice_sk
    bob_pk = G1.one() * bob_sk
    carol_pk = G1.one() * carol_sk

    # Round one
    alice_dh_1 = bob_pk * carol_sk
    bob_dh_1 = carol_pk * alice_sk
    carol_dh_1 = alice_pk * bob_sk

    # Round two
    alice_dh_2 = alice_dh_1 * alice_sk
    bob_dh_2 = bob_dh_1 * bob_sk
    carol_dh_2 = carol_dh_1 * carol_sk

    assert alice_dh_2 == bob_dh_2 == carol_dh_2
    print("dh: three-party shared secret agrees")


if __name__ == "__main__":
    main()
