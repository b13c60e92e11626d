"""circuit-stats static analyzer: histograms, memory ordering, projections.

Counterpart of the reference analyzer (circuit_stats.rs:63-664); checks every
output section on a synthetic circuit exercising each tracked opcode class.
"""

from provekit_tpu.acir import model as acir
from provekit_tpu.compiler import circuit_stats as cs

w = acir.Witness


def build_circuit():
    fi = acir.FunctionInput
    e = acir.Expression
    ops = [
        acir.AssertZero(e(mul_terms=[(1, w(0), w(1))],
                          linear_combinations=[(2, w(2))])),
        acir.AssertZero(e(mul_terms=[(1, w(0), w(0)), (3, w(1), w(1))])),
        acir.BlackBoxAnd(fi(w(0), 32), fi(w(1), 32), w(3)),
        acir.BlackBoxAnd(fi(w(0), 8), fi(5, 8), w(4)),
        acir.BlackBoxXor(fi(w(0), 32), fi(w(1), 32), w(5)),
        acir.BlackBoxRange(fi(w(6), 16)),
        acir.BlackBoxRange(fi(w(7), 16)),
        acir.BlackBoxRange(fi(w(8), 8)),
        acir.MemoryInit(block_id=0, init=[w(0), w(1), w(2)]),
        acir.MemoryOp(0, acir.MemOp(1, e.constant(0), e.from_witness(w(0)))),
        acir.MemoryOp(0, acir.MemOp(0, e.constant(0), e.from_witness(w(9)))),
        acir.MemoryOp(0, acir.MemOp(1, e.constant(0), e.from_witness(w(1)))),
        acir.BrilligCall(id=0),
        acir.BrilligCall(id=0),
        acir.BlackBoxUnsupported("Sha256Compression"),
        acir.BlackBoxUnsupported("Poseidon2Permutation"),
    ]
    return acir.Circuit(opcodes=ops, private_parameters=[0, 1],
                        public_parameters=[2], return_values=[3])


def test_analyze_sections():
    stats = cs.analyze(build_circuit())
    assert stats["private_inputs"] == 2
    assert stats["public_inputs"] == 1
    assert stats["return_values"] == 1
    assert stats["num_assert_zero"] == 2
    assert stats["num_mul_terms"] == 3
    assert stats["blackbox"]["AND"] == 2
    assert stats["blackbox"]["XOR"] == 1
    assert stats["blackbox"]["RANGE"] == 3
    assert stats["and_bit_counts"] == {(32, 32): 1, (8, 8): 1}
    assert stats["xor_bit_counts"] == {(32, 32): 1}
    assert stats["and_input_classes"] == {"homogeneous_witness": 1,
                                          "heterogeneous": 1}
    assert stats["range_bit_counts"] == {16: 2, 8: 1}
    assert stats["mem_inits"] == 1
    assert stats["mem_alloc_total"] == 3
    assert stats["mem_reads"] == 1
    assert stats["mem_writes"] == 2
    # write at index 0 AFTER a read of index 0 -> not read-only
    assert stats["read_only"] is False
    assert stats["write_after_read_blocks"] == [0]
    assert stats["brillig_calls"] == 2
    assert stats["unique_brillig_functions"] == 1
    assert stats["unsupported_blackbox"] == {"Sha256Compression": 1,
                                             "Poseidon2Permutation": 1}


def test_projections():
    stats = cs.analyze(build_circuit())
    names = [n for n, _, _ in stats["projections"]]
    assert names == ["AssertZero", "Sha256Compression",
                     "Poseidon2Permutation", "range checks"]
    # AssertZero: opcodes + mul_terms (reference formula)
    assert stats["projections"][0][1] == 2 + 3
    assert stats["projections"][1][1] == cs.SHA256_COMPRESSION_CONSTRAINTS
    assert stats["projections"][2][2] == cs.POSEIDON2_WITNESSES
    # range checks: 2 rows per check, num_bits extra witnesses per check
    assert stats["projections"][3] == ("range checks", 6, 16 * 2 + 8)
    assert stats["projected_constraints"] == sum(
        r for _, r, _ in stats["projections"])


def test_report_renders():
    stats = cs.analyze(build_circuit())
    text = cs.report(stats)
    for needle in ("Num AssertZero: 2", "Blackbox fn AND: 2",
                   "RANGE check: 16 bits had 2 lookups",
                   "Read-only: False", "projected R1CS constraints"):
        assert needle in text, needle


def test_read_only_circuit():
    e = acir.Expression
    ops = [
        acir.MemoryInit(block_id=0, init=[w(0)]),
        acir.MemoryOp(0, acir.MemOp(1, e.constant(0), e.from_witness(w(0)))),
        acir.MemoryOp(0, acir.MemOp(0, e.constant(0), e.from_witness(w(1)))),
    ]
    stats = cs.analyze(acir.Circuit(opcodes=ops))
    assert stats["read_only"] is True
    assert stats["write_after_read_blocks"] == []
