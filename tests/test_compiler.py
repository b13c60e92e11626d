"""Compiler tests: ACIR gadget lowering -> witness solve -> R1CS satisfaction.

Mirrors the reference's compiler test matrix
(``tooling/provekit-bench/tests/compiler.rs:27-85``) behaviorally: each test
targets one gadget family (assert-zero, read-only memory, read-write memory,
range checks, bin ops), builds the ACIR circuit programmatically, solves the
witness program, and checks A z o B z = C z on device.
"""

import random

import pytest

from provekit_tpu.acir import model as acir
from provekit_tpu.compiler import NoirProofScheme, noir_to_r1cs
from provekit_tpu.fields import bn254 as F
from provekit_tpu.fields import vector as V


def check_satisfied(program, acir_values, expect_challenges=None):
    scheme = NoirProofScheme.from_program(program, security_level=30,
                                          max_pow_bits=6)
    witness = scheme.solve_witness(acir_values, rng=random.Random(5))
    z = V.pack([F.to_mont(v) for v in witness])
    assert scheme.r1cs.check_z0(z)
    assert scheme.r1cs.is_satisfied(z), "R1CS not satisfied"
    return scheme, witness


def wrap(circuit):
    return acir.Program(functions=[circuit])


def test_assert_zero():
    # x*y - z == 0 and x + y - w == 0
    w = acir.Witness
    c = acir.Circuit(opcodes=[
        acir.AssertZero(acir.Expression(
            mul_terms=[(1, w(0), w(1))],
            linear_combinations=[(F.P - 1, w(2))])),
        acir.AssertZero(acir.Expression(
            linear_combinations=[(1, w(0)), (1, w(1)), (F.P - 1, w(3))])),
    ], private_parameters=[0, 1], return_values=[2, 3])
    vals = {0: 3, 1: 7, 2: 21, 3: 10}
    scheme, _ = check_satisfied(wrap(c), vals)
    # negative: wrong product
    bad = dict(vals)
    bad[2] = 22
    witness = scheme.solve_witness(bad, rng=random.Random(6))
    z = V.pack([F.to_mont(v) for v in witness])
    assert not scheme.r1cs.is_satisfied(z)


def test_assert_zero_multi_mul():
    # 2*x*y + 3*y*z - 5*x*z + x - 9 == 0 (several mul terms)
    w = acir.Witness
    x, y, z = 5, 4, (2 * 5 * 4 + 5 - 9 + 3 * 4)  # solve 3*y*z - 5*x*z = -(2xy + x - 9)
    # pick z to satisfy: (3y - 5x)z = -(2xy + x - 9) => z = ...
    num = -(2 * x * y + x - 9)
    den = 3 * y - 5 * x
    zval = num * pow(den, F.P - 2, F.P) % F.P
    c = acir.Circuit(opcodes=[
        acir.AssertZero(acir.Expression(
            mul_terms=[(2, w(0), w(1)), (3, w(1), w(2)), (F.P - 5, w(0), w(2))],
            linear_combinations=[(1, w(0))],
            q_c=F.P - 9)),
    ])
    check_satisfied(wrap(c), {0: x, 1: y, 2: zval})


def test_rom():
    # memory [10,20,30], two reads at witness addresses
    w = acir.Witness
    ops = [
        acir.MemoryInit(block_id=0, init=[w(0), w(1), w(2)]),
        acir.MemoryOp(0, acir.MemOp(0, acir.Expression.from_witness(w(3)),
                                    acir.Expression.from_witness(w(4)))),
        acir.MemoryOp(0, acir.MemOp(0, acir.Expression.from_witness(w(5)),
                                    acir.Expression.from_witness(w(6)))),
    ]
    c = acir.Circuit(opcodes=ops)
    vals = {0: 10, 1: 20, 2: 30, 3: 2, 4: 30, 5: 0, 6: 10}
    scheme, _ = check_satisfied(wrap(c), vals)
    # wrong read value
    bad = dict(vals)
    bad[4] = 31
    witness = scheme.solve_witness(bad, rng=random.Random(6))
    z = V.pack([F.to_mont(v) for v in witness])
    assert not scheme.r1cs.is_satisfied(z)


def test_ram():
    # init [5,6], store 7 at addr0, read addr0 -> 7, read addr1 -> 6
    w = acir.Witness
    ops = [
        acir.MemoryInit(block_id=0, init=[w(0), w(1)]),
        acir.MemoryOp(0, acir.MemOp(1, acir.Expression.from_witness(w(2)),
                                    acir.Expression.from_witness(w(3)))),
        acir.MemoryOp(0, acir.MemOp(0, acir.Expression.from_witness(w(4)),
                                    acir.Expression.from_witness(w(5)))),
        acir.MemoryOp(0, acir.MemOp(0, acir.Expression.from_witness(w(6)),
                                    acir.Expression.from_witness(w(7)))),
    ]
    c = acir.Circuit(opcodes=ops)
    vals = {0: 5, 1: 6, 2: 0, 3: 7, 4: 0, 5: 7, 6: 1, 7: 6}
    scheme, _ = check_satisfied(wrap(c), vals)
    # wrong loaded value must fail
    bad = dict(vals)
    bad[5] = 5
    witness = scheme.solve_witness(bad, rng=random.Random(6))
    z = V.pack([F.to_mont(v) for v in witness])
    assert not scheme.r1cs.is_satisfied(z)


def test_memory_predicates_and_expression_index():
    """Predicated MemoryOps + expression indices (beyond the reference,
    which asserts predicate.is_none() — noir_to_r1cs.rs:283).

    ACVM semantics: a disabled (p=0) read assigns 0 to its value witness; a
    disabled write is skipped.  The lowering rewrites ops against a scratch
    slot (compiler/noir_to_r1cs.py::add_memory_op)."""
    w = acir.Witness
    pred = acir.Expression.from_witness
    ops = [
        acir.MemoryInit(block_id=0, init=[w(0), w(1)]),
        # store 9 at addr 0, predicated ON (w5=1)
        acir.MemoryOp(0, acir.MemOp(1, pred(w(2)), pred(w(3))),
                      predicate=pred(w(5))),
        # store 11 at addr 0, predicated OFF (w6=0) -> must not land
        acir.MemoryOp(0, acir.MemOp(1, pred(w(2)), pred(w(4))),
                      predicate=pred(w(6))),
        # read at expression index (w7 + 1) == addr 1 -> 6
        acir.MemoryOp(0, acir.MemOp(
            0, acir.Expression(linear_combinations=[(1, w(7))], q_c=1),
            pred(w(8)))),
        # disabled read -> value witness must be 0
        acir.MemoryOp(0, acir.MemOp(0, pred(w(2)), pred(w(9))),
                      predicate=pred(w(6))),
        # enabled read back at addr 0 -> 9 (the ON store, not the OFF one)
        acir.MemoryOp(0, acir.MemOp(0, pred(w(2)), pred(w(10))),
                      predicate=pred(w(5))),
    ]
    c = acir.Circuit(opcodes=ops)
    vals = {0: 5, 1: 6, 2: 0, 3: 9, 4: 11, 5: 1, 6: 0, 7: 0, 8: 6,
            9: 0, 10: 9}
    scheme, _ = check_satisfied(wrap(c), vals)
    # a disabled read claiming a non-zero value must fail
    bad = dict(vals)
    bad[9] = 5
    witness = scheme.solve_witness(bad, rng=random.Random(6))
    z = V.pack([F.to_mont(v) for v in witness])
    assert not scheme.r1cs.is_satisfied(z)
    # the disabled store must not be claimable as landed
    bad = dict(vals)
    bad[10] = 11
    witness = scheme.solve_witness(bad, rng=random.Random(6))
    z = V.pack([F.to_mont(v) for v in witness])
    assert not scheme.r1cs.is_satisfied(z)


def test_memory_predicate_rom_and_executor_parity():
    """Predicated reads on a read-only block, values produced by the real
    ACVM executor (acir/execute.py) rather than hand-fed."""
    from provekit_tpu.acir.execute import execute_program
    w = acir.Witness
    pred = acir.Expression.from_witness
    ops = [
        acir.MemoryInit(block_id=0, init=[w(0), w(1), w(2)]),
        acir.MemoryOp(0, acir.MemOp(0, pred(w(3)), pred(w(4))),
                      predicate=pred(w(5))),
        acir.MemoryOp(0, acir.MemOp(0, pred(w(3)), pred(w(6))),
                      predicate=acir.Expression.constant(0)),
    ]
    c = acir.Circuit(opcodes=ops, private_parameters=[0, 1, 2, 3, 5])
    inputs = {0: 10, 1: 20, 2: 30, 3: 2, 5: 1}
    acir_values = execute_program(wrap(c), inputs)
    assert acir_values[4] == 30 and acir_values[6] == 0
    check_satisfied(wrap(c), acir_values)


def test_range_check_small_naive():
    # 2-bit checks on 3 witnesses (below lookup threshold -> naive product)
    w = acir.Witness
    ops = [acir.BlackBoxRange(acir.FunctionInput(w(i), 2)) for i in range(3)]
    c = acir.Circuit(opcodes=ops)
    scheme, _ = check_satisfied(wrap(c), {0: 0, 1: 3, 2: 2})
    witness = scheme.solve_witness({0: 0, 1: 4, 2: 2}, rng=random.Random(6))
    z = V.pack([F.to_mont(v) for v in witness])
    assert not scheme.r1cs.is_satisfied(z)


def test_range_check_u8_lookup():
    # 6 values at 8 bits -> logup table path
    w = acir.Witness
    ops = [acir.BlackBoxRange(acir.FunctionInput(w(i), 8)) for i in range(6)]
    c = acir.Circuit(opcodes=ops)
    vals = {i: v for i, v in enumerate([0, 255, 17, 128, 3, 77])}
    scheme, _ = check_satisfied(wrap(c), vals)
    bad = dict(vals)
    bad[2] = 256
    with pytest.raises((ValueError, IndexError, RuntimeError)):
        # multiplicity counting hits an out-of-range index
        scheme.solve_witness(bad, rng=random.Random(6))


def test_range_check_u16_decomposition():
    # 16-bit check -> two 8-bit digits via digital decomposition
    w = acir.Witness
    ops = [acir.BlackBoxRange(acir.FunctionInput(w(i), 16)) for i in range(6)]
    c = acir.Circuit(opcodes=ops)
    vals = {i: v for i, v in enumerate([0, 65535, 256, 12345, 999, 40000])}
    check_satisfied(wrap(c), vals)


def test_range_check_u12_mixed_bases():
    # 12-bit check -> 8-bit digit + 4-bit remainder digit
    w = acir.Witness
    ops = [acir.BlackBoxRange(acir.FunctionInput(w(0), 12))]
    c = acir.Circuit(opcodes=ops)
    check_satisfied(wrap(c), {0: 4000})


@pytest.mark.slow
def test_binop_and_xor():
    w = acir.Witness
    a, b = 0xDEADBEEF, 0x12345678
    ops = [
        acir.BlackBoxAnd(acir.FunctionInput(w(0), 32),
                         acir.FunctionInput(w(1), 32), w(2)),
        acir.BlackBoxXor(acir.FunctionInput(w(0), 32),
                         acir.FunctionInput(w(3), 32), w(4)),
    ]
    c = acir.Circuit(opcodes=ops)
    vals = {0: a, 1: b, 2: a & b, 3: b, 4: a ^ b}
    scheme, _ = check_satisfied(wrap(c), vals)
    bad = dict(vals)
    bad[2] = (a & b) ^ 1
    witness = scheme.solve_witness(bad, rng=random.Random(6))
    z = V.pack([F.to_mont(v) for v in witness])
    assert not scheme.r1cs.is_satisfied(z)


def test_native_solver_matches_python():
    from provekit_tpu import native
    if not native.available():
        pytest.skip("native library not built")
    w = acir.Witness
    ops = [
        acir.MemoryInit(block_id=0, init=[w(0), w(1)]),
        acir.MemoryOp(0, acir.MemOp(1, acir.Expression.from_witness(w(2)),
                                    acir.Expression.from_witness(w(3)))),
        acir.MemoryOp(0, acir.MemOp(0, acir.Expression.from_witness(w(4)),
                                    acir.Expression.from_witness(w(5)))),
        acir.BlackBoxRange(acir.FunctionInput(w(6), 12)),
        acir.AssertZero(acir.Expression(
            mul_terms=[(1, w(0), w(1))],
            linear_combinations=[(F.P - 1, w(7))])),
    ]
    c = acir.Circuit(opcodes=ops, return_values=[7])
    vals = {0: 5, 1: 6, 2: 0, 3: 7, 4: 0, 5: 7, 6: 4000, 7: 30}
    scheme = NoirProofScheme.from_program(wrap(c), security_level=30,
                                          max_pow_bits=6)
    wn = scheme.solve_witness(vals, rng=random.Random(3), use_native=True)
    wp = scheme.solve_witness(vals, rng=random.Random(3), use_native=False)
    assert wn == wp
