"""SHA-256 circuit family: constants KAT, satisfaction, end-to-end prove.

The reference exercises SHA via ``small-sha`` in its compiler test matrix
(``tooling/provekit-bench/tests/compiler.rs:76-86``) and benchmarks
``noir-examples/sha256`` (BASELINE.md measurement protocol step 2); here the
circuit generator itself asserts its digest against ``hashlib.sha256``, and
these tests push the generated ACIR through the full gadget stack.
"""

import hashlib
import random

import pytest

from provekit_tpu.circuits import sha256 as S
from provekit_tpu.fields import bn254 as F
from provekit_tpu.fields import vector as V


def test_fips_constants():
    # FIPS 180-4 §4.2.2/§5.3.3 initial values
    assert S.H0[0] == 0x6A09E667
    assert S.H0[7] == 0x5BE0CD19
    assert S.K[0] == 0x428A2F98
    assert S.K[63] == 0xC67178F2


def test_digest_matches_hashlib():
    for msg in (b"", b"abc", b"a" * 100):
        _, _, digest = S.sha256_circuit(msg)
        assert digest == hashlib.sha256(msg).digest()


def test_multi_block():
    msg = bytes(range(200))  # 4 compression blocks after padding
    prog, _, digest = S.sha256_circuit(msg)
    assert digest == hashlib.sha256(msg).digest()
    assert len(prog.functions[0].opcodes) > 10000


@pytest.mark.slow
def test_sha256_r1cs_satisfied():
    from provekit_tpu.compiler import NoirProofScheme
    prog, vals, _ = S.sha256_circuit(b"abc")
    scheme = NoirProofScheme.from_program(prog, security_level=30,
                                          max_pow_bits=6)
    witness = scheme.solve_witness(vals, rng=random.Random(5))
    z = V.pack([F.to_mont(v) for v in witness])
    assert scheme.r1cs.check_z0(z)
    assert scheme.r1cs.is_satisfied(z)
