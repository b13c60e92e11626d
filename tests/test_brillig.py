"""Brillig VM + ACVM executor tests: in-tree witness generation.

The reference runs Noir witness generation through the external ACVM/Brillig
VM (``provekit/prover/src/noir_proof_scheme.rs:36-62``); these tests exercise
the from-scratch Python implementation: VM semantics (arithmetic, control
flow, memory, calldata, radix decomposition) and full circuit execution
(expression solving, BrilligCall output assignment, memory replay,
black-boxes), ending in an R1CS-satisfying witness.
"""

import random

import pytest

from provekit_tpu.acir import brillig as B
from provekit_tpu.acir import execute as acvm
from provekit_tpu.acir import model as acir
from provekit_tpu.fields import bn254 as F

D = B.MemoryAddress.direct
REL = B.MemoryAddress.rel


def run(code, calldata=(), handler=None):
    return B.BrilligVM(list(code), list(calldata), handler).run()


def stop(ptr_slot, size_slot):
    return B.Stop(B.HeapVector(pointer=D(ptr_slot), size=D(size_slot)))


# ---------------------------------------------------------------------------
# VM semantics


def test_field_arithmetic_and_return():
    # r = (a + b) * a  computed in fields; return [r]
    code = [
        B.Const(D(10), 32, 2), B.Const(D(11), 32, 0),
        B.CalldataCopy(D(1), D(10), D(11)),      # mem[1..3] = calldata
        B.BinaryFieldOp(D(3), "Add", D(1), D(2)),
        B.BinaryFieldOp(D(4), "Mul", D(3), D(1)),
        B.Const(D(5), 32, 4),   # return pointer
        B.Const(D(6), 32, 1),   # return size
        stop(5, 6),
    ]
    a, b = 1234, 5678
    assert run(code, [a, b]) == [(a + b) * a % F.P]


def test_field_div_is_modular():
    code = [
        B.Const(D(10), 32, 2), B.Const(D(11), 32, 0),
        B.CalldataCopy(D(1), D(10), D(11)),
        B.BinaryFieldOp(D(3), "Div", D(1), D(2)),
        B.Const(D(5), 32, 3), B.Const(D(6), 32, 1),
        stop(5, 6),
    ]
    a, b = 7, 3
    (r,) = run(code, [a, b])
    assert r * b % F.P == a


def test_int_ops_wrap_and_compare():
    code = [
        B.Const(D(1), 8, 200), B.Const(D(2), 8, 100),
        B.BinaryIntOp(D(3), "Add", 8, D(1), D(2)),       # 300 wraps to 44
        B.BinaryIntOp(D(4), "LessThan", 8, D(2), D(1)),  # 1
        B.BinaryIntOp(D(5), "Xor", 8, D(1), D(2)),
        B.BinaryIntOp(D(6), "Shl", 8, D(2), D(4)),       # 100 << 1 = 200
        B.Not(D(7), D(4), 1),                            # !1 = 0
        B.Const(D(8), 32, 3), B.Const(D(9), 32, 5),
        stop(8, 9),
    ]
    assert run(code) == [44, 1, 200 ^ 100, 200, 0]


def test_loop_sum_1_to_10():
    # mem[1]=i, mem[2]=acc, mem[3]=limit, loop with JumpIf
    code = [
        B.Const(D(1), 32, 1),
        B.Const(D(2), 32, 0),
        B.Const(D(3), 32, 11),
        B.Const(D(4), 32, 1),
        # loop head (pc=4): if i == limit -> exit
        B.BinaryIntOp(D(5), "Equals", 32, D(1), D(3)),
        B.JumpIf(D(5), 9),
        B.BinaryIntOp(D(2), "Add", 32, D(2), D(1)),
        B.BinaryIntOp(D(1), "Add", 32, D(1), D(4)),
        B.Jump(4),
        # exit (pc=9)
        B.Const(D(6), 32, 2), B.Const(D(7), 32, 1),
        stop(6, 7),
    ]
    assert run(code) == [55]


def test_call_return_and_relative_addressing():
    # Callee squares mem[sp+0] into mem[sp+1]. Caller sets sp=100.
    code = [
        B.Const(D(0), 32, 100),        # 0: stack pointer
        B.Const(D(100), B.FIELD, 7),   # 1: arg at sp+0
        B.Call(6),                     # 2: call callee
        B.Const(D(2), 32, 101),        # 3
        B.Const(D(3), 32, 1),          # 4
        stop(2, 3),                    # 5
        B.BinaryFieldOp(REL(1), "Mul", REL(0), REL(0)),  # 6: callee
        B.Return(),                    # 7
    ]
    assert run(code) == [49]


def test_load_store_indirect():
    code = [
        B.Const(D(1), 32, 50),            # pointer -> 50
        B.Const(D(2), B.FIELD, 99),
        B.Store(D(1), D(2)),              # mem[50] = 99
        B.Load(D(3), D(1)),               # mem[3] = mem[50]
        B.IndirectConst(D(1), B.FIELD, 123),  # mem[50] = 123
        B.Load(D(4), D(1)),
        B.Const(D(5), 32, 3), B.Const(D(6), 32, 2),
        stop(5, 6),
    ]
    assert run(code) == [99, 123]


def test_conditional_mov_and_cast():
    code = [
        B.Const(D(1), B.FIELD, 0),
        B.Const(D(2), B.FIELD, 10),
        B.Const(D(3), B.FIELD, 20),
        B.ConditionalMov(D(4), D(2), D(3), D(1)),  # cond=0 -> source_b
        B.Const(D(5), B.FIELD, 257),
        B.Cast(D(6), D(5), 8),                     # 257 mod 256 = 1
        B.Const(D(7), 32, 4), B.Const(D(8), 32, 1),
        stop(7, 8),
        B.Const(D(9), 32, 0),
    ]
    # return mem[4]; then also check the cast cell directly
    vm = B.BrilligVM(code, [])
    out = vm.run()
    assert out == [20]
    assert vm.memory.read(D(6))[0] == 1


def test_to_radix_big_endian_limbs():
    code = [
        B.Const(D(1), B.FIELD, 0x1234),
        B.Const(D(2), 32, 256),       # radix
        B.Const(D(3), 32, 10),        # output pointer -> mem[10]
        B.ToRadix(D(1), D(2), D(3), num_limbs=2, output_bits=False),
        B.Const(D(4), 32, 10), B.Const(D(5), 32, 2),
        stop(4, 5),
    ]
    assert run(code) == [0x12, 0x34]  # most significant limb first


def test_trap_raises():
    code = [B.Trap()]
    with pytest.raises(B.BrilligTrap):
        run(code)


def test_step_budget():
    code = [B.Jump(0)]
    vm = B.BrilligVM(code, [], max_steps=1000)
    with pytest.raises(B.BrilligError, match="step budget"):
        vm.run()


def test_foreign_call_print_ignored_and_handler():
    code = [
        B.Const(D(1), B.FIELD, 5),
        B.ForeignCall("print", destinations=[], inputs=[D(1)]),
        B.ForeignCall("get_two", destinations=[D(2)], inputs=[D(1)]),
        B.Const(D(3), 32, 2), B.Const(D(4), 32, 1),
        stop(3, 4),
    ]

    def handler(name, inputs):
        if name == "print":
            return []
        assert name == "get_two" and inputs == [[5]]
        return [[10]]

    assert run(code, handler=handler) == [10]


# ---------------------------------------------------------------------------
# ACVM circuit execution


def test_acvm_brillig_inverse_circuit():
    # Classic unconstrained-inverse pattern: w1 = 1/w0 via Brillig,
    # constrained by w0*w1 - 1 == 0.
    w = acir.Witness
    inv_code = B.BrilligBytecode(bytecode=[
        B.Const(D(10), 32, 1), B.Const(D(11), 32, 0),
        B.CalldataCopy(D(1), D(10), D(11)),
        B.Const(D(2), B.FIELD, 1),
        B.BinaryFieldOp(D(4), "Div", D(2), D(1)),
        B.Const(D(5), 32, 4), B.Const(D(6), 32, 1),
        stop(5, 6),
    ])
    circuit = acir.Circuit(opcodes=[
        acir.BrilligCall(
            id=0,
            inputs=[acir.BrilligInputSingle(acir.Expression.from_witness(w(0)))],
            outputs=[acir.BrilligOutputSimple(w(1))]),
        acir.AssertZero(acir.Expression(
            mul_terms=[(1, w(0), w(1))], q_c=F.P - 1)),
    ], private_parameters=[0], current_witness_index=1)
    program = acir.Program(functions=[circuit],
                           unconstrained_functions=[inv_code])

    x = 987654321
    wmap = acvm.execute_program(program, {0: x})
    assert wmap[1] == pow(x, F.P - 2, F.P)


def test_acvm_assert_zero_solving_chain():
    # w1 = 3*w0 + 5; w2 = w1 * w1 (solved through mul term partial eval)
    w = acir.Witness
    circuit = acir.Circuit(opcodes=[
        acir.AssertZero(acir.Expression(
            linear_combinations=[(3, w(0)), (F.P - 1, w(1))], q_c=5)),
        acir.AssertZero(acir.Expression(
            mul_terms=[(1, w(1), w(1))],
            linear_combinations=[(F.P - 1, w(2))])),
    ], private_parameters=[0])
    program = acir.Program(functions=[circuit])
    wmap = acvm.execute_program(program, {0: 4})
    assert wmap[1] == 17 and wmap[2] == 17 * 17


def test_acvm_unsatisfied_constraint():
    w = acir.Witness
    circuit = acir.Circuit(opcodes=[
        acir.AssertZero(acir.Expression(
            linear_combinations=[(1, w(0))], q_c=F.P - 7)),
    ], private_parameters=[0])
    with pytest.raises(acvm.ExecutionError, match="unsatisfied"):
        acvm.execute_program(acir.Program(functions=[circuit]), {0: 8})


def test_acvm_memory_read_write():
    w = acir.Witness
    circuit = acir.Circuit(opcodes=[
        acir.MemoryInit(block_id=0, init=[w(0), w(1)]),
        # write w2 -> index 0
        acir.MemoryOp(0, acir.MemOp(1, acir.Expression.constant(0),
                                    acir.Expression.from_witness(w(2)))),
        # read index 0 -> w3
        acir.MemoryOp(0, acir.MemOp(0, acir.Expression.constant(0),
                                    acir.Expression.from_witness(w(3)))),
        # predicated-off read -> w4 must become 0
        acir.MemoryOp(0, acir.MemOp(0, acir.Expression.constant(1),
                                    acir.Expression.from_witness(w(4))),
                      predicate=acir.Expression.constant(0)),
    ])
    wmap = acvm.execute_program(
        acir.Program(functions=[circuit]), {0: 5, 1: 6, 2: 42})
    assert wmap[3] == 42 and wmap[4] == 0


def test_acvm_blackbox_and_xor_range():
    w = acir.Witness
    circuit = acir.Circuit(opcodes=[
        acir.BlackBoxAnd(acir.FunctionInput(w(0), 8),
                         acir.FunctionInput(w(1), 8), w(2)),
        acir.BlackBoxXor(acir.FunctionInput(w(0), 8),
                         acir.FunctionInput(w(1), 8), w(3)),
        acir.BlackBoxRange(acir.FunctionInput(w(2), 8)),
    ])
    wmap = acvm.execute_program(
        acir.Program(functions=[circuit]), {0: 0xF0, 1: 0x3C})
    assert wmap[2] == 0xF0 & 0x3C
    assert wmap[3] == 0xF0 ^ 0x3C


def test_acvm_range_failure():
    w = acir.Witness
    circuit = acir.Circuit(opcodes=[
        acir.BlackBoxRange(acir.FunctionInput(w(0), 4)),
    ])
    with pytest.raises(acvm.ExecutionError, match="range check failed"):
        acvm.execute_program(acir.Program(functions=[circuit]), {0: 16})


def test_acvm_brillig_predicate_false_zeroes_outputs():
    w = acir.Witness
    code = B.BrilligBytecode(bytecode=[B.Trap()])  # would trap if run
    circuit = acir.Circuit(opcodes=[
        acir.BrilligCall(id=0, inputs=[], outputs=[
            acir.BrilligOutputArray([w(1), w(2)])],
            predicate=acir.Expression.constant(0)),
    ])
    program = acir.Program(functions=[circuit], unconstrained_functions=[code])
    wmap = acvm.execute_program(program, {0: 1})
    assert wmap[1] == 0 and wmap[2] == 0


def test_acvm_initial_witness_from_abi_inputs():
    circuit = acir.Circuit(private_parameters=[0, 2],
                           public_parameters=[1])
    init = acvm.initial_witness_from_inputs(circuit, [10, 20, 30])
    assert init == {0: 10, 1: 20, 2: 30}


# ---------------------------------------------------------------------------
# End-to-end: Brillig witness generation -> compile -> solve -> R1CS satisfied


def test_e2e_brillig_witgen_to_r1cs():
    from provekit_tpu.compiler import NoirProofScheme
    from provekit_tpu.fields import vector as V

    w = acir.Witness
    inv_code = B.BrilligBytecode(bytecode=[
        B.Const(D(10), 32, 1), B.Const(D(11), 32, 0),
        B.CalldataCopy(D(1), D(10), D(11)),
        B.Const(D(2), B.FIELD, 1),
        B.BinaryFieldOp(D(4), "Div", D(2), D(1)),
        B.Const(D(5), 32, 4), B.Const(D(6), 32, 1),
        stop(5, 6),
    ])
    circuit = acir.Circuit(opcodes=[
        acir.BrilligCall(
            id=0,
            inputs=[acir.BrilligInputSingle(acir.Expression.from_witness(w(0)))],
            outputs=[acir.BrilligOutputSimple(w(1))]),
        acir.AssertZero(acir.Expression(
            mul_terms=[(1, w(0), w(1))], q_c=F.P - 1)),
        acir.AssertZero(acir.Expression(
            linear_combinations=[(1, w(1)), (F.P - 1, w(2))])),
    ], private_parameters=[0], return_values=[2])
    program = acir.Program(functions=[circuit],
                           unconstrained_functions=[inv_code])

    scheme = NoirProofScheme.from_program(program, security_level=30,
                                          max_pow_bits=6)
    acir_values = scheme.generate_witness([7])
    witness = scheme.solve_witness(acir_values, rng=random.Random(5))
    z = V.pack([F.to_mont(v) for v in witness])
    assert scheme.r1cs.is_satisfied(z)
