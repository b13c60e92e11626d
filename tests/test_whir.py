"""End-to-end WHIR PCS tests: commit -> open -> verify, plus soundness probes.

Low security level keeps query counts and PoW small for CPU test runs; the
protocol structure (rounds, folds, Merkle openings) is identical at 128-bit.
"""

import random

import pytest

from provekit_tpu.fields import bn254 as F
from provekit_tpu.fields import vector as V
from provekit_tpu.fs import DomainSeparator
from provekit_tpu.ops import sumcheck as sc
from provekit_tpu.whir import (DenseWeights, Statement, WhirConfig, committer,
                               prover, verifier)
from provekit_tpu.whir.verifier import WhirError


def mont_pack(xs):
    return V.pack([F.to_mont(x) for x in xs])


def make_config(m, batch=1, security=30):
    return WhirConfig(num_variables=m, batch_size=batch,
                      security_level=security, max_pow_bits=6)


def build_proof(m=6, batch=2, n_constraints=2, seed=0, security=30):
    rng = random.Random(seed)
    config = make_config(m, batch, security)
    polys_ints = [[rng.randrange(F.P) for _ in range(1 << m)]
                  for _ in range(batch)]
    polys = [mont_pack(p) for p in polys_ints]

    ds = DomainSeparator("whir-test")
    committer.commit_pattern(ds, config)
    prover.proof_pattern(ds, config)

    from provekit_tpu.fs.device import DeviceProverState
    from provekit_tpu.ops import merkle
    tr = DeviceProverState(ds)
    com = committer.commit(tr, config, polys)

    # statement over the combined polynomial
    gamma = F.from_mont(V.unpack_scalar(com.batching_randomness))
    combined_ints = [0] * (1 << m)
    g = 1
    for p in polys_ints:
        for i, v in enumerate(p):
            combined_ints[i] = (combined_ints[i] + g * v) % F.P
        g = g * gamma % F.P

    statement = Statement(m)
    weights_ints = []
    for _ in range(n_constraints):
        wv = [rng.randrange(F.P) for _ in range(1 << m)]
        sigma = sum(w * v for w, v in zip(wv, combined_ints)) % F.P
        statement.add_constraint(DenseWeights.from_ints(wv, m), sigma)
        weights_ints.append(wv)

    out = prover.prove(tr, config, com, statement)
    proof = tr.narg_string()
    return config, ds, proof, statement, com, out


def test_whir_roundtrip_m6():
    config, ds, proof, statement, com, _ = build_proof(m=6, batch=2)
    tr = ds.to_verifier_state(proof)
    parsed = verifier.parse_commitment(tr, config)
    from provekit_tpu.ops import merkle
    assert parsed.root == V.unpack_scalar(merkle.root_dev(com.tree))
    assert parsed.batching_randomness == F.from_mont(
        V.unpack_scalar(com.batching_randomness))
    binders = verifier.verify(tr, config, parsed, statement)
    tr.finish()
    assert len(binders) == config.num_variables


@pytest.mark.slow
def test_whir_roundtrip_m9_single():
    # m=9: 1 full round + final sumcheck rounds (9 = 4 + 4 + 1)
    # ~5 min on CPU (limb emulation); multi-round coverage also comes from
    # test_e2e / test_device_fs which run the full m=11 pipeline.
    config, ds, proof, statement, com, _ = build_proof(
        m=9, batch=1, n_constraints=1, seed=3)
    assert config.n_rounds == 1 and config.final_sumcheck_rounds == 1
    tr = ds.to_verifier_state(proof)
    parsed = verifier.parse_commitment(tr, config)
    verifier.verify(tr, config, parsed, statement)
    tr.finish()


def test_whir_rejects_wrong_sum():
    config, ds, proof, statement, com, _ = build_proof(m=6, batch=2, seed=1)
    bad = Statement(config.num_variables)
    (w0, s0), (w1, s1) = statement.constraints
    bad.add_constraint(w0, (s0 + 1) % F.P)
    bad.add_constraint(w1, s1)
    tr = ds.to_verifier_state(proof)
    parsed = verifier.parse_commitment(tr, config)
    with pytest.raises(WhirError):
        verifier.verify(tr, config, parsed, bad)


def test_whir_rejects_tampered_proof():
    config, ds, proof, statement, com, _ = build_proof(m=6, batch=2, seed=2)
    rejected = 0
    for pos in [0, 40, len(proof) // 2, len(proof) - 40]:
        bad = bytearray(proof)
        bad[pos] ^= 1
        tr = ds.to_verifier_state(bytes(bad))
        try:
            parsed = verifier.parse_commitment(tr, config)
            verifier.verify(tr, config, parsed, statement)
            tr.finish()
        except (WhirError, ValueError):
            rejected += 1
    assert rejected == 4
