"""Golden Noir-artifact fixtures through the FULL front door.

Each fixture in tests/fixtures/ is a complete build-artifact JSON (ABI +
base64 gzip msgpack bytecode — the parse surface of
``tooling/cli/src/cmd/circuit_stats.rs:39-53``).  The tests run
parse -> ABI input encode -> ACVM/Brillig execute -> compile -> prove ->
verify for each, covering AssertZero, RANGE/AND/XOR, ROM memory and
Brillig witness generation.  Fixtures regenerate with
``python scripts/make_acir_fixtures.py`` (byte-stable output).
"""

import pathlib
import random

import pytest

from provekit_tpu.acir import encode
from provekit_tpu.acir.execute import (execute_program,
                                       initial_witness_from_inputs)
from provekit_tpu.acir.parse import artifact_abi, parse_artifact
from provekit_tpu.compiler import NoirProofScheme
from provekit_tpu.fields import bn254 as F

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(autouse=True, scope="module")
def _cheap_sync_tails():
    """These tests exercise the ACIR FRONT DOOR, not the device kernels —
    run the tiny proves with CHEAP_SYNC host tails (each fixture has a
    distinct circuit geometry, and compiling fresh per-shape executables
    costs ~5 min per prove on this host; kernel coverage lives in the
    dedicated kernel/e2e tests)."""
    from provekit_tpu import config
    from provekit_tpu.ops import ntt as ntt_mod
    from provekit_tpu.ops import sumcheck as sc_mod
    saved = (config.CHEAP_SYNC, sc_mod.HOST_TAIL, ntt_mod.HOST_TAIL)
    config.CHEAP_SYNC = True
    sc_mod.HOST_TAIL = max(sc_mod.HOST_TAIL, 1 << 16)
    ntt_mod.HOST_TAIL = max(ntt_mod.HOST_TAIL, 1 << 16)
    yield
    config.CHEAP_SYNC, sc_mod.HOST_TAIL, ntt_mod.HOST_TAIL = saved


def _prove_roundtrip(program, acir_values):
    from provekit_tpu.parallel import make_mesh
    scheme = NoirProofScheme.from_program(program, security_level=3,
                                          max_pow_bits=2)
    witness = scheme.solve_witness(acir_values, rng=random.Random(5))
    # 1-device mesh -> per-round sumcheck path, fully host-tailed under
    # CHEAP_SYNC (the fused segments would compile fresh per-geometry
    # executables; byte-equality of the paths is pinned in test_device_fs)
    proof = scheme.whir_for_witness.prove(scheme.r1cs, witness,
                                          rng=random.Random(6),
                                          mesh=make_mesh(1))
    scheme.whir_for_witness.verify(scheme.r1cs, proof)
    return scheme


def _load(name):
    path = FIXTURES / f"{name}.json"
    return parse_artifact(path), artifact_abi(path)


def test_fixtures_regenerate_byte_stable():
    import json
    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "scripts"))
    import make_acir_fixtures as gen
    for name, build in gen.FIXTURES.items():
        program_doc, abi_doc = build()
        want = json.loads((FIXTURES / f"{name}.json").read_text())
        got = encode.artifact_json(program_doc, abi_doc)
        assert got == want, f"fixture {name} drifted from its generator"


def test_mul_chain_fixture():
    program, abi = _load("mul_chain")
    circuit = program.functions[0]
    assert len(circuit.opcodes) == 2
    assert abi.field_count() == 2
    init = initial_witness_from_inputs(circuit, [6, 7])
    wmap = execute_program(program, init)
    assert wmap[2] == 42 and wmap[3] == 42 * 42
    _prove_roundtrip(program, wmap)


def test_range_and_xor_fixture():
    """Parse -> execute -> compile -> solve -> satisfaction.

    No WHIR prove here: the AND/XOR gadget emits the 2^16-entry pair table
    (binops.rs:26-181), so this circuit is ~2^17 witnesses — the binop
    PROVING path is covered by the compiler gadget matrix; this test pins
    the artifact front door for the blackbox opcodes."""
    import jax.numpy as jnp
    from provekit_tpu.fields import vector as V
    program, _ = _load("range_and_xor")
    circuit = program.functions[0]
    init = initial_witness_from_inputs(circuit, [0xA5, 0x3C])
    wmap = execute_program(program, init)
    assert wmap[2] == 0xA5 & 0x3C
    assert wmap[3] == 0xA5 ^ 0x3C
    scheme = NoirProofScheme.from_program(program, security_level=3,
                                          max_pow_bits=2)
    witness = scheme.solve_witness(wmap, rng=random.Random(5))
    z = V.to_mont(V.pack(witness))
    assert scheme.r1cs.is_satisfied(z)


def test_range_fixture_rejects_out_of_range():
    program, _ = _load("range_and_xor")
    circuit = program.functions[0]
    init = initial_witness_from_inputs(circuit, [0x1A5, 0x3C])  # 9 bits
    with pytest.raises(Exception):
        execute_program(program, init)


def test_rom_fixture():
    program, _ = _load("rom_reads")
    circuit = program.functions[0]
    init = initial_witness_from_inputs(circuit, [11, 13])
    wmap = execute_program(program, init)
    assert wmap[2] == 11 and wmap[3] == 13 and wmap[4] == 143
    _prove_roundtrip(program, wmap)


def test_brillig_inverse_fixture():
    program, _ = _load("brillig_inverse")
    circuit = program.functions[0]
    x = 12345
    init = initial_witness_from_inputs(circuit, [x])
    wmap = execute_program(program, init)
    assert wmap[1] == pow(x, F.P - 2, F.P)
    _prove_roundtrip(program, wmap)


def test_tampered_witness_fails_satisfaction():
    import jax.numpy as jnp  # noqa: F401
    from provekit_tpu.fields import vector as V
    program, _ = _load("mul_chain")
    circuit = program.functions[0]
    init = initial_witness_from_inputs(circuit, [6, 7])
    wmap = execute_program(program, init)
    wmap[3] += 1  # break z*z == t
    scheme = NoirProofScheme.from_program(program, security_level=3,
                                          max_pow_bits=2)
    witness = scheme.solve_witness(wmap, rng=random.Random(5))
    z = V.to_mont(V.pack(witness))
    assert not scheme.r1cs.is_satisfied(z)
