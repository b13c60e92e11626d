"""Device-resident Fiat-Shamir: bit-exactness against the host transcript.

The device prover (fs/device.py) must emit byte-identical transcripts to
the host ``ProverState`` path — the verifier replays with the host sponge,
so any drift is an immediate soundness/compat break.
"""

import hashlib
import random

import pytest

from provekit_tpu.fields import bn254 as F
from provekit_tpu.fields import vector as V
from provekit_tpu.fs import DomainSeparator
from provekit_tpu.fs.device import DeviceProverState


def test_device_transcript_matches_host():
    rng = random.Random(7)
    ds = DomainSeparator("test")
    (ds.absorb(2, "a").squeeze(3, "s").absorb(1, "b").absorb(2, "c")
       .squeeze(1, "t").hint("h").absorb(1, "d"))

    vals1 = [rng.randrange(F.P) for _ in range(2)]
    vals2 = [rng.randrange(F.P) for _ in range(2)]

    h = ds.to_prover_state()
    h.add_scalars(vals1)
    ch1 = h.challenge_scalars(3)
    h.add_scalars([ch1[0]])
    h.add_scalars(vals2)
    ch2 = h.challenge_scalars(1)
    h.hint_bytes(b"hello")
    h.add_scalars([ch2[0]])
    host_narg = h.narg_string()

    d = DeviceProverState(ds)
    d.add_scalars(vals1)
    c1 = d.challenge_scalars_dev(3)
    d.add_scalars_dev(c1[:, :1])
    d.add_scalars(vals2)
    c2 = d.challenge_scalars_dev(1)
    d.hint_bytes(b"hello")
    d.add_scalars_dev(c2)
    assert d.narg_string() == host_narg


def test_device_pow_matches_host():
    from provekit_tpu.ops import pow as P
    rng = random.Random(3)
    for bits in (2.0, 6.0):
        ch = rng.randrange(1 << 200)
        host = P.solve(ch, bits)
        dev = V.unpack(P.solve_dev(V.pack([ch]).reshape(16, 1), bits))[0]
        assert host == dev
        assert P.verify(ch, bits, dev)


def test_proof_bytes_regression():
    """Pinned transcript digest: the protocol's byte layout is normative.

    Any change to challenge derivation, absorb order, PoW scan order, STIR
    dedup, or hint serialization changes this digest — bump it ONLY for a
    deliberate protocol change (which breaks old proofs)."""
    from tests.test_e2e import build_system
    from tests.test_verifier_circuit import tiny_scheme
    r1cs, witness = build_system(seed=3, n_mults=1)
    scheme = tiny_scheme(r1cs, security=3, folding=2, max_pow=2)
    proof = scheme.prove(r1cs, witness, rng=random.Random(11))
    # Bumped round 2 for deliberate protocol changes: the ZK-mask entropy
    # fix (256-bit OS-entropy key derivation) and the reference wire format
    # for hints (merkle_proof / stir_answers / deferred_weight_evaluations /
    # claimed_evaluations in ark canonical encoding; the new hint labels
    # also change the IO-pattern IV).
    assert hashlib.sha256(proof).hexdigest() == (
        "c7c57278707ea8475678cc4c0c8194b78a0c7024cd39cbb445a51d1aa40f00b9")
    scheme.verify(r1cs, proof)
