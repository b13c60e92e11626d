"""Generate golden Noir-artifact fixtures for the ACIR front door.

Each fixture is a full build-artifact JSON (ABI + base64 gzip msgpack
bytecode, the format of ``tooling/cli/src/cmd/circuit_stats.rs:39-53``)
covering one compiler surface: AssertZero, RANGE/AND/XOR black boxes, ROM
memory, and Brillig witness generation.  Regenerate with
``python scripts/make_acir_fixtures.py``; tests/test_acir_fixtures.py runs
each through parse -> execute -> compile -> prove -> verify.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from provekit_tpu.acir.encode import field_hex, write_artifact  # noqa: E402
from provekit_tpu.fields import bn254 as F  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"

M1 = field_hex(F.P - 1)  # -1


def expr(mul=(), lin=(), q_c=0):
    return {
        "mul_terms": [[field_hex(c), a, b] for c, a, b in mul],
        "linear_combinations": [[field_hex(c), w] for c, w in lin],
        "q_c": field_hex(q_c),
    }


def witness_input(w, bits):
    return {"input": {"Witness": w}, "num_bits": bits}


def abi(params, ret=None):
    doc = {"parameters": params}
    if ret is not None:
        doc["return_type"] = {"abi_type": ret, "visibility": "public"}
    return doc


def field_param(name, visibility="private"):
    return {"name": name, "type": {"kind": "field"}, "visibility": visibility}


def int_param(name, width, visibility="private"):
    return {"name": name, "type": {"kind": "integer", "sign": "unsigned",
                                   "width": width}, "visibility": visibility}


def mul_chain():
    """z = x*y; t = z*z.  Pure AssertZero (the acir_assert_zero surface)."""
    ops = [
        {"AssertZero": expr(mul=[(1, 0, 1)], lin=[(F.P - 1, 2)])},
        {"AssertZero": expr(mul=[(1, 2, 2)], lin=[(F.P - 1, 3)])},
    ]
    circuit = {
        "opcodes": ops,
        "private_parameters": [0],
        "public_parameters": [1],
        "return_values": [3],
        "current_witness_index": 4,
    }
    program = {"functions": [circuit], "unconstrained_functions": []}
    return program, abi([field_param("x"), field_param("y", "public")],
                        {"kind": "field"})


def range_and_xor():
    """u8 inputs a, b; RANGE both; c = a AND b; d = a XOR b."""
    ops = [
        {"BlackBoxFuncCall": {"RANGE": {"input": witness_input(0, 8)}}},
        {"BlackBoxFuncCall": {"RANGE": {"input": witness_input(1, 8)}}},
        {"BlackBoxFuncCall": {"AND": {"lhs": witness_input(0, 8),
                                      "rhs": witness_input(1, 8),
                                      "output": 2}}},
        {"BlackBoxFuncCall": {"XOR": {"lhs": witness_input(0, 8),
                                      "rhs": witness_input(1, 8),
                                      "output": 3}}},
        # d - c = (a XOR b) - (a AND B) is public output e
        {"AssertZero": expr(lin=[(1, 3), (F.P - 1, 2), (F.P - 1, 4)])},
    ]
    circuit = {
        "opcodes": ops,
        "private_parameters": [0, 1],
        "public_parameters": [],
        "return_values": [4],
        "current_witness_index": 5,
    }
    program = {"functions": [circuit], "unconstrained_functions": []}
    return program, abi([int_param("a", 8), int_param("b", 8)],
                        {"kind": "field"})


def rom_reads():
    """ROM block [x, y]; read both slots; constrain product."""
    ops = [
        {"MemoryInit": {"block_id": 0, "init": [0, 1],
                        "block_type": "Memory"}},
        {"MemoryOp": {"block_id": 0,
                      "op": {"operation": expr(),
                             "index": expr(q_c=0),
                             "value": expr(lin=[(1, 2)])},
                      "predicate": None}},
        {"MemoryOp": {"block_id": 0,
                      "op": {"operation": expr(),
                             "index": expr(q_c=1),
                             "value": expr(lin=[(1, 3)])},
                      "predicate": None}},
        {"AssertZero": expr(mul=[(1, 2, 3)], lin=[(F.P - 1, 4)])},
    ]
    circuit = {
        "opcodes": ops,
        "private_parameters": [0, 1],
        "public_parameters": [],
        "return_values": [4],
        "current_witness_index": 5,
    }
    program = {"functions": [circuit], "unconstrained_functions": []}
    return program, abi([field_param("x"), field_param("y")],
                        {"kind": "field"})


def brillig_inverse():
    """w1 = 1/x via an unconstrained function, then x * w1 == 1."""
    direct = lambda a: {"Direct": a}
    bytecode = [
        {"Const": {"destination": direct(10), "bit_size": {"Integer": "U32"},
                   "value": field_hex(1)}},
        {"Const": {"destination": direct(11), "bit_size": {"Integer": "U32"},
                   "value": field_hex(0)}},
        {"CalldataCopy": {"destination_address": direct(0),
                          "size_address": direct(10),
                          "offset_address": direct(11)}},
        {"Const": {"destination": direct(1), "bit_size": "Field",
                   "value": field_hex(1)}},
        {"BinaryFieldOp": {"destination": direct(2), "op": "Div",
                           "lhs": direct(1), "rhs": direct(0)}},
        {"Const": {"destination": direct(20), "bit_size": {"Integer": "U32"},
                   "value": field_hex(2)}},
        {"Const": {"destination": direct(21), "bit_size": {"Integer": "U32"},
                   "value": field_hex(1)}},
        {"Stop": {"return_data": {"pointer": direct(20),
                                  "size": direct(21)}}},
    ]
    ops = [
        {"BrilligCall": {"id": 0,
                         "inputs": [{"Single": expr(lin=[(1, 0)])}],
                         "outputs": [{"Simple": 1}],
                         "predicate": None}},
        {"AssertZero": expr(mul=[(1, 0, 1)], q_c=F.P - 1)},
    ]
    circuit = {
        "opcodes": ops,
        "private_parameters": [0],
        "public_parameters": [],
        "return_values": [],
        "current_witness_index": 2,
    }
    program = {"functions": [circuit],
               "unconstrained_functions": [{"bytecode": bytecode}]}
    return program, abi([field_param("x")])


FIXTURES = {
    "mul_chain": mul_chain,
    "range_and_xor": range_and_xor,
    "rom_reads": rom_reads,
    "brillig_inverse": brillig_inverse,
}


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for name, build in FIXTURES.items():
        program, abi_doc = build()
        path = OUT / f"{name}.json"
        write_artifact(path, program, abi_doc)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
