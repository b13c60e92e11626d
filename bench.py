"""Benchmark harness: end-to-end prove throughput on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The headline metric mirrors the reference's bench target (prove wall-clock /
R1CS constraints-per-second on a hash-chain circuit; the reference tracks
``prove_poseidon_1000`` via CodSpeed on a Raspberry Pi 5 — no absolute
numbers are published, so vs_baseline is null until a reference measurement
exists on comparable hardware; see BASELINE.md).
"""

import json
import os
import random
import sys
import time


def build_chain_r1cs(n_constraints: int):
    """Multiplication/addition chain (poseidon-rounds-like AssertZero load)."""
    from provekit_tpu.fields import bn254 as F
    from provekit_tpu.r1cs import R1CS

    rng = random.Random(0xBEEF)
    r = R1CS()
    x = r.new_witness()
    vals = {0: 1, x: rng.randrange(F.P)}
    prev = x
    while r.num_constraints < n_constraints - 1:
        sq = r.new_witness()
        r.add_constraint([(1, prev)], [(1, prev)], [(1, sq)])
        vals[sq] = vals[prev] * vals[prev] % F.P
        nxt = r.new_witness()
        r.add_constraint([(3, sq), (1, prev), (7, 0)], [(1, 0)], [(1, nxt)])
        vals[nxt] = (3 * vals[sq] + vals[prev] + 7) % F.P
        prev = nxt
    witness = [vals[i] for i in range(r.num_witnesses)]
    return r, witness


def main():
    n_constraints = int(os.environ.get("BENCH_CONSTRAINTS", 1 << 12))
    security = int(os.environ.get("BENCH_SECURITY", 60))
    max_pow = int(os.environ.get("BENCH_MAX_POW", 10))

    from provekit_tpu.protocol import WhirR1CSScheme

    r1cs, witness = build_chain_r1cs(n_constraints)
    scheme = WhirR1CSScheme.new_for_r1cs(r1cs, security_level=security,
                                         max_pow_bits=max_pow)

    # warmup (compile)
    rng = random.Random(1)
    proof = scheme.prove(r1cs, witness, rng=rng)
    scheme.verify(r1cs, proof)

    t0 = time.perf_counter()
    proof = scheme.prove(r1cs, witness, rng=rng)
    prove_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    scheme.verify(r1cs, proof)
    verify_s = time.perf_counter() - t0

    cps = r1cs.num_constraints / prove_s
    import jax
    print(json.dumps({
        "metric": "prove_constraints_per_sec",
        "value": round(cps, 1),
        "unit": "constraints/s",
        "vs_baseline": None,
        "prove_seconds": round(prove_s, 3),
        "verify_seconds": round(verify_s, 3),
        "num_constraints": r1cs.num_constraints,
        "num_witnesses": r1cs.num_witnesses,
        "proof_bytes": len(proof),
        "security_level": security,
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
