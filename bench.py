"""Benchmark harness: end-to-end prove throughput on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The workload mirrors the reference's headline benchmark
(``prove_poseidon_1000``: a Poseidon2 hash chain —
``tooling/provekit-bench/benches/bench.rs:17-34``): BENCH_HASHES
Poseidon2-shaped hashes (512 R1CS constraints each).  The reference
publishes no absolute numbers (CodSpeed-relative on a Raspberry Pi 5), so
vs_baseline is null until a reference measurement exists on comparable
hardware; see BASELINE.md.

Defaults are the REFERENCE parameters: BENCH_HASHES=1000 (the reference's
``prove_poseidon_1000``), security 128 with ConjectureList-style max-pow
derivation (``default_max_pow``, whir_r1cs.rs:43).

Env knobs: BENCH_HASHES (default 1000), BENCH_SECURITY (default 128),
BENCH_MAX_POW (default: reference default_max_pow per config),
BENCH_CIRCUIT (poseidon | p256 | sha256 | passport).
"""

import json
import os
import random
import sys
import time


def build_circuit(kind: str, n_hashes: int):
    if kind == "p256":
        # ECDSA verify, the noir-examples/p256_std workload (~600k constraints)
        from provekit_tpu.circuits import p256
        pub, r, s, h = p256.ecdsa_test_vector(seed=1, nbits=256)
        program, acir_values = p256.ecdsa_verify_circuit(pub, r, s, h)
        return program, acir_values, "p256-ecdsa-verify"
    if kind == "passport":
        # composed flagship: sha256 + ROM reads + date checks + P-256 ECDSA
        # (noir-passport-examples/complete_age_check counterpart)
        from provekit_tpu.circuits import passport
        dg1, sod, off, date, age, sig = passport.passport_test_vector(seed=1)
        program, acir_values = passport.passport_circuit(
            dg1, sod, off, date, age, signature=sig)
        return program, acir_values, "passport-age-check"
    if kind == "sha256":
        # The reference's sha256 examples hash 1-2 bytes (1-2 compression
        # blocks, noir-examples/sha256/src/main.nr); 10 chained blocks
        # (~314k constraints, m=21) is already ~100x that scale and the
        # largest that fits a 16 GB chip comfortably — 100 blocks puts the
        # witness poly at m=24 (domain 2^25, multi-GB wide temps) and
        # RESOURCE_EXHAUSTs HBM.  Override with BENCH_SHA_BLOCKS.
        n_blocks = int(os.environ.get("BENCH_SHA_BLOCKS",
                                      str(n_hashes // 100 or 1)))
        from provekit_tpu.circuits import sha256
        program, acir_values, _ = sha256.chain_circuit(n_blocks=n_blocks)
        return program, acir_values, f"sha256-chain x{n_blocks}"
    from provekit_tpu.circuits import poseidon
    program, acir_values, _ = poseidon.hash_chain_circuit(n_hashes)
    return program, acir_values, f"poseidon2-chain x{n_hashes}"


def main():
    n_hashes = int(os.environ.get("BENCH_HASHES", 1000))
    security = int(os.environ.get("BENCH_SECURITY", 128))
    max_pow = (int(os.environ["BENCH_MAX_POW"])
               if "BENCH_MAX_POW" in os.environ else None)
    kind = os.environ.get("BENCH_CIRCUIT", "poseidon")

    from provekit_tpu.compiler import NoirProofScheme

    # Circuit construction is *fixture generation* (the reference's prepare
    # subcommand parses an already-compiled ACIR artifact — `nargo compile`
    # is not part of its timed path, cmd/prepare.rs:31-37); time it
    # separately so prepare_seconds measures ACIR->R1CS compilation like
    # the reference's `prepare`.
    t0 = time.perf_counter()
    program, acir_values, workload = build_circuit(kind, n_hashes)
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    scheme = NoirProofScheme.from_program(
        program, security_level=security, max_pow_bits=max_pow)
    prepare_s = time.perf_counter() - t0
    r1cs = scheme.r1cs

    rng = random.Random(1)
    t0 = time.perf_counter()
    witness = scheme.solve_witness(acir_values, rng=rng)
    solve_s = time.perf_counter() - t0

    # warmup (compile)
    proof = scheme.whir_for_witness.prove(r1cs, witness, rng=rng)
    scheme.whir_for_witness.verify(r1cs, proof)

    from provekit_tpu.utils.profiling import GLOBAL
    mark = len(GLOBAL.root.children)
    t0 = time.perf_counter()
    proof = scheme.whir_for_witness.prove(r1cs, witness, rng=rng)
    prove_s = time.perf_counter() - t0
    # coarse phase breakdown of the timed prove (dispatch wall-times; the
    # final narg_fetch blocks on the whole device backlog).  Recorded into
    # the JSON so BENCH_rNN carries the breakdown, not just the total.
    prove_spans = {s.name: round(s.elapsed, 3)
                   for s in GLOBAL.root.children[mark:]}

    t0 = time.perf_counter()
    scheme.whir_for_witness.verify(r1cs, proof)
    verify_s = time.perf_counter() - t0

    if os.environ.get("BENCH_SPANS"):
        print(GLOBAL.report(), file=sys.stderr)

    cps = r1cs.num_constraints / prove_s
    import jax
    print(json.dumps({
        "metric": "prove_constraints_per_sec",
        "value": round(cps, 1),
        "unit": "constraints/s",
        "vs_baseline": None,
        "workload": workload,
        "prove_seconds": round(prove_s, 3),
        "verify_seconds": round(verify_s, 3),
        "witness_solve_seconds": round(solve_s, 3),
        "prepare_seconds": round(prepare_s, 3),
        "circuit_build_seconds": round(build_s, 3),
        "num_constraints": r1cs.num_constraints,
        "num_witnesses": r1cs.num_witnesses,
        "proof_bytes": len(proof),
        "proof_bytes_budget": scheme.whir_for_witness.proof_size_budget(),
        "security_level": security,
        "platform": jax.devices()[0].platform,
        "prove_spans": prove_spans,
    }))


if __name__ == "__main__":
    main()

# (span report printed to stderr when BENCH_SPANS=1)
