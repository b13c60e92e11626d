"""End-to-end scheme tests: R1CS -> prove -> verify (the full pipeline)."""

import random

import pytest

from provekit_tpu.fields import bn254 as F
from provekit_tpu.fields import vector as V
from provekit_tpu.protocol import WhirR1CSScheme
from provekit_tpu.r1cs import R1CS
from provekit_tpu.whir.verifier import WhirError


def build_system(seed=0, n_mults=5):
    """Chain of multiplications: z_{i+1} = z_i * z_i + z_i."""
    rng = random.Random(seed)
    r = R1CS()
    x0 = r.new_witness()
    vals = {0: 1, x0: rng.randrange(F.P)}
    prev = x0
    for _ in range(n_mults):
        sq = r.new_witness()
        r.add_constraint([(1, prev)], [(1, prev)], [(1, sq)])
        vals[sq] = vals[prev] * vals[prev] % F.P
        nxt = r.new_witness()
        r.add_constraint([(1, sq), (1, prev)], [(1, 0)], [(1, nxt)])
        vals[nxt] = (vals[sq] + vals[prev]) % F.P
        prev = nxt
    witness = [vals[i] for i in range(r.num_witnesses)]
    return r, witness


def test_e2e_prove_verify_and_tamper():
    r1cs, witness = build_system()
    z = V.pack([F.to_mont(v) for v in witness])
    assert r1cs.is_satisfied(z)

    scheme = WhirR1CSScheme.new_for_r1cs(r1cs, security_level=30,
                                         max_pow_bits=6)
    proof = scheme.prove(r1cs, witness, rng=random.Random(42))
    scheme.verify(r1cs, proof)  # must not raise

    # proofs are nondeterministic (ZK masking) but verify again from bytes
    proof2 = scheme.prove(r1cs, witness, rng=random.Random(43))
    assert proof2 != proof
    scheme.verify(r1cs, proof2)

    # corrupt one byte near the middle -> must be rejected
    rejected = 0
    for pos in [8, len(proof) // 2, len(proof) - 33]:
        bad = bytearray(proof)
        bad[pos] ^= 1
        with pytest.raises((WhirError, ValueError)):
            scheme.verify(r1cs, bytes(bad))
        rejected += 1
    assert rejected == 3


def test_e2e_wrong_witness_rejected():
    r1cs, witness = build_system(seed=1)
    bad_witness = list(witness)
    bad_witness[2] = (bad_witness[2] + 1) % F.P
    scheme = WhirR1CSScheme.new_for_r1cs(r1cs, security_level=30,
                                         max_pow_bits=6)
    proof = scheme.prove(r1cs, bad_witness, rng=random.Random(7))
    with pytest.raises(WhirError):
        scheme.verify(r1cs, proof)
