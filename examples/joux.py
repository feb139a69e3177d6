"""Joux one-round three-party key agreement via the pairing.

Executable acceptance test of the whole stack (scalar mul in both groups,
pairing, Gt exponentiation); behavioral model: reference examples/
joux.rs:3-22.
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bn254_tpu import Fr, G1, G2, pairing


def main():
    alice_sk = Fr.random()
    bob_sk = Fr.random()
    carol_sk = Fr.random()

    alice_pk1, alice_pk2 = G1.one() * alice_sk, G2.one() * alice_sk
    bob_pk1, bob_pk2 = G1.one() * bob_sk, G2.one() * bob_sk
    carol_pk1, carol_pk2 = G1.one() * carol_sk, G2.one() * carol_sk

    alice_ss = pairing(bob_pk1, carol_pk2).pow(alice_sk)
    bob_ss = pairing(carol_pk1, alice_pk2).pow(bob_sk)
    carol_ss = pairing(alice_pk1, bob_pk2).pow(carol_sk)

    assert alice_ss == bob_ss == carol_ss
    print("joux: one-round three-party shared secret agrees")


if __name__ == "__main__":
    main()
