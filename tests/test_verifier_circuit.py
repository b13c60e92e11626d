"""The in-circuit WHIR+Spartan verifier: synthesize and check satisfaction.

Counterpart of the reference's gnark circuit tests (exercised only by its
e2e workflow — there are no Go unit tests upstream; SURVEY §4): here the
circuit is synthesized for a real proof and its R1CS checked directly,
plus negative tests that a tampered proof yields an unsatisfiable system.
"""

import random

import pytest

from provekit_tpu.fields import bn254 as F
from provekit_tpu.fields import vector as V
from provekit_tpu.protocol import WhirR1CSScheme
from provekit_tpu.protocol.scheme import next_power_of_two_log
from provekit_tpu.r1cs import R1CS
from provekit_tpu.whir.parameters import WhirConfig

from tests.test_e2e import build_system


def tiny_scheme(r1cs, security=3, folding=2, max_pow=0):
    """A deliberately small scheme so the wrapper circuit stays compact."""
    m = next_power_of_two_log(r1cs.num_witnesses) + 1
    m_0 = max(1, next_power_of_two_log(r1cs.num_constraints))
    blinding_vars = next_power_of_two_log(4 * m_0) + 1
    return WhirR1CSScheme(
        m=m, m_0=m_0,
        a_num_terms=next_power_of_two_log(max(1, r1cs.a.nnz)),
        whir_witness=WhirConfig(
            num_variables=m, batch_size=2, security_level=security,
            max_pow_bits=max_pow, folding_factor=folding),
        whir_for_hiding_spartan=WhirConfig(
            num_variables=blinding_vars, batch_size=2,
            security_level=security, max_pow_bits=max_pow,
            folding_factor=folding),
        security_level=security, max_pow_bits=max_pow)


def _satisfied(builder):
    r1cs, z = builder.build()
    zm = V.pack([F.to_mont(v) for v in z])
    ok = r1cs.is_satisfied(zm)
    return ok, r1cs


@pytest.fixture(scope="module")
def inner():
    r1cs, witness = build_system(seed=3, n_mults=1)
    scheme = tiny_scheme(r1cs)
    proof = scheme.prove(r1cs, witness, rng=random.Random(11))
    scheme.verify(r1cs, proof)  # sanity: host verifier accepts
    return r1cs, scheme, proof


def test_circuit_accepts_valid_proof(inner):
    from provekit_tpu.recursion.wrap import build_verifier_circuit
    r1cs, scheme, proof = inner
    builder = build_verifier_circuit(scheme, r1cs, proof)
    ok, wrapper = _satisfied(builder)
    assert ok, "verifier circuit rejected a valid proof"
    # publics = the absorbed transcript scalars + the 2 lookup challenges
    from provekit_tpu.recursion.gadgets import split_transcript
    scalars, _ = split_transcript(scheme.create_io_pattern(), proof)
    assert builder.num_public == len(scalars) + 2
    assert wrapper.num_public_inputs == len(scalars) + 2
    assert builder.lookups.committed, "lookup path not engaged"


def test_circuit_bitwise_path_matches(inner):
    """The legacy boolean-decomposition path (lookups=False) still accepts
    the same proof, with publics = transcript scalars only — and costs
    several times more constraints than the lookup path."""
    from provekit_tpu.recursion.wrap import build_verifier_circuit
    r1cs, scheme, proof = inner
    b_look = build_verifier_circuit(scheme, r1cs, proof)
    b_bits = build_verifier_circuit(scheme, r1cs, proof, lookups=False)
    ok, wrapper = _satisfied(b_bits)
    assert ok
    from provekit_tpu.recursion.gadgets import split_transcript
    scalars, _ = split_transcript(scheme.create_io_pattern(), proof)
    assert wrapper.num_public_inputs == len(scalars)
    assert b_bits.num_constraints > 2 * b_look.num_constraints


def test_circuit_rejects_tampered_proof(inner):
    from provekit_tpu.recursion.wrap import build_verifier_circuit
    from provekit_tpu.whir.verifier import WhirError
    r1cs, scheme, proof = inner
    # flip a low-order byte of the first committed root scalar: either the
    # synthesis itself fails (host-side hint mismatch) or the circuit is
    # unsatisfiable — never a satisfied system.
    bad = bytearray(proof)
    bad[0] ^= 1
    try:
        builder = build_verifier_circuit(scheme, r1cs, bytes(bad))
    except (WhirError, ValueError, AssertionError):
        return
    ok, _ = _satisfied(builder)
    assert not ok, "verifier circuit accepted a tampered proof"


@pytest.mark.slow
def test_groth16_wrap_end_to_end(inner):
    """The full recursion: proof -> verifier circuit -> Groth16 (native MSM)."""
    import random as _random
    from provekit_tpu.recursion import wrap
    r1cs, scheme, proof = inner
    rk = wrap.setup(scheme, r1cs, proof, rng=_random.Random(1))
    g16, publics = wrap.prove(rk, scheme, r1cs, proof, rng=_random.Random(2))
    assert wrap.verify(rk, g16, publics)
    bad = list(publics)
    bad[0] = (bad[0] + 1) % F.P
    assert not wrap.verify(rk, g16, bad)


def test_tampered_claimed_sums_hint(inner):
    """Hint-only tampering: native verifier rejects; circuit ignores hints.

    The trailing bytes of the proof are the deferred_weight_evaluations hint
    — PRIVATE witness, not absorbed into the sponge.  The recursion circuit
    deliberately recomputes every weight eval and ignores the hinted values
    (recursion/verifier_circuit.py:397-402; stronger than gnark, which
    trusts them into the final identity), so a hint-only flip leaves the
    circuit satisfiable with the same public inputs.  Soundness against a
    lying hint is carried by the NATIVE verifier, which completes the
    deferred evaluations itself and must reject.
    """
    from provekit_tpu.recursion.wrap import build_verifier_circuit
    from provekit_tpu.whir.verifier import WhirError
    r1cs, scheme, proof = inner
    bad = bytearray(proof)
    bad[-20] ^= 1
    with pytest.raises((WhirError, ValueError, AssertionError)):
        scheme.verify(r1cs, bytes(bad))
    # the circuit's public statement is unchanged: synthesis either fails
    # fast (host-side replay notices the lie) or yields a satisfiable
    # system whose recomputed weight evals are independent of the hint.
    try:
        builder = build_verifier_circuit(scheme, r1cs, bytes(bad))
    except (WhirError, ValueError, AssertionError):
        return
    ok, _ = _satisfied(builder)
    assert ok, "recomputed-hint circuit should not depend on hint bytes"


def test_circuit_multi_query_rounds_with_duplicates():
    """Regression: sorted-dedup STIR query weighting in the circuit.

    At real parameters the drawn queries are neither sorted nor distinct;
    the claim combination must weight the SORTED-UNIQUE indices with
    chat^(ood+rank), exactly like the prover/host verifier (round-4 fix in
    _hinted_openings; previously the circuit weighted by draw order and
    re-added duplicates, desyncing the claim at >=2 queries).  security=20
    over a 2^5 folded domain draws 20 round-0 queries -> duplicates are
    certain.  debug_assert checks every emitted row against the host
    assignment, so a completed synthesis == a satisfied circuit.
    """
    r1cs, witness = build_system(seed=5, n_mults=8)
    scheme = tiny_scheme(r1cs, security=20, folding=2, max_pow=0)
    proof = scheme.prove(r1cs, witness, rng=random.Random(21))
    scheme.verify(r1cs, proof)
    from provekit_tpu.recursion.wrap import build_verifier_circuit
    builder = build_verifier_circuit(scheme, r1cs, proof, debug_assert=True)
    assert builder.num_constraints > 0
