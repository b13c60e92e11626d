"""Recursion at real parameters: synthesize the verifier circuit for a
security->=100 proof, report wire/constraint counts + walltimes, and wrap
in Groth16 when the size is tractable -> RECURSION JSON.

Counterpart of the reference's production recursion
(recursive-verifier/app/circuit/circuit.go:19-82 wraps real proofs in CI,
.github/workflows/end-to-end.yml:44-84); round-3 verdict item 5 asks for
wire counts and walltime at non-toy parameters, and — if the count
explodes — where.

Env knobs:
  RECUR_HASHES    inner poseidon chain length        (default 4)
  RECUR_SECURITY  scheme security level              (default 100)
  RECUR_MAX_POW   grinding cap (None -> derivation)  (default: derived)
  RECUR_WRAP_MAX  max wires for the Groth16 wrap     (default 400000)

Usage: python scripts/recursion_scale.py [out.json]
"""

import json
import os
import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def compress_cost() -> int:
    """Measured constraints of ONE in-circuit Skyscraper compress (lookup
    path — the production route; round-4's 5,078-constraint boolean bar is
    the lookups=False fallback)."""
    from provekit_tpu.recursion.builder import CircuitBuilder
    from provekit_tpu.recursion.gadgets import compress
    from provekit_tpu.recursion.lookup import Lookups
    b = CircuitBuilder()
    b.lookups = Lookups(b)
    x = b.alloc(3)
    compress(b, x, x)
    return b.num_constraints


def estimate(scheme, r1cs, c_comp: int) -> dict:
    """Static per-phase constraint estimate from the scheme config alone."""
    est = {}
    for label, cfg in (("witness", scheme.whir_witness),
                       ("blinding", scheme.whir_for_hiding_spartan)):
        merkle = 0
        leaves = 0
        grind = 0
        log_leaves = cfg.starting_log_domain - cfg.initial_folding_factor
        leaf_elems = (1 << cfg.initial_folding_factor) * cfg.batch_size
        for rc in cfg.rounds + [None]:
            if rc is None:
                nq = cfg.final_queries
            else:
                nq = rc.num_queries
            merkle += nq * log_leaves * c_comp
            leaves += nq * (leaf_elems - 1) * c_comp
            grind += c_comp
            if rc is not None:
                # next oracle: domain halves (-1) while the fold width stays
                # 2^folding_factor, so tree depth drops by exactly one (the
                # -folding_factor from the fold and +folding_factor from
                # re-leafing cancel)
                log_leaves = max(0, log_leaves - 1)
                leaf_elems = 1 << cfg.folding_factor
        est[f"whir_{label}_merkle_paths"] = merkle
        est[f"whir_{label}_leaf_hashing"] = leaves
        est[f"whir_{label}_pow_checks"] = grind
    # Fiat-Shamir sponge replay: every absorb/squeeze permute
    n_permutes = 0
    for op in scheme.create_io_pattern().ops:
        if op.kind in ("A", "S"):
            n_permutes += op.count  # upper bound (N=2 R=1: ~1/unit)
    est["fs_sponge_replay"] = n_permutes * c_comp
    est["matrix_extension_eval"] = 2 * (r1cs.a.nnz + r1cs.b.nnz + r1cs.c.nnz)
    est["eq_tables"] = 2 * (1 << scheme.m_0) + 2 * (1 << scheme.m)
    est["total_estimate"] = sum(est.values())
    return est


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    n_hashes = int(os.environ.get("RECUR_HASHES", 4))
    security = int(os.environ.get("RECUR_SECURITY", 100))
    max_pow = (int(os.environ["RECUR_MAX_POW"])
               if "RECUR_MAX_POW" in os.environ else None)
    wrap_max = int(os.environ.get("RECUR_WRAP_MAX", 8_000_000))

    from provekit_tpu.circuits import poseidon
    from provekit_tpu.compiler import NoirProofScheme

    doc = {"inner": f"poseidon2-chain x{n_hashes}",
           "security_level": security}

    t0 = time.perf_counter()
    program, acir_values, _ = poseidon.hash_chain_circuit(n_hashes)
    scheme = NoirProofScheme.from_program(
        program, security_level=security, max_pow_bits=max_pow)
    r1cs = scheme.r1cs
    w = scheme.whir_for_witness
    doc["inner_constraints"] = r1cs.num_constraints
    doc["inner_witnesses"] = r1cs.num_witnesses
    doc["m"] = w.m
    doc["m_0"] = w.m_0
    doc["whir_witness_rounds"] = [
        {"queries": rc.num_queries, "ood": rc.ood_samples,
         "pow_bits": round(rc.pow_bits, 1)} for rc in w.whir_witness.rounds]
    doc["whir_witness_final_queries"] = w.whir_witness.final_queries
    print(f"inner: {r1cs.num_constraints} constraints, m={w.m} m_0={w.m_0}")

    rng = random.Random(7)
    witness = scheme.solve_witness(acir_values, rng=rng)
    t1 = time.perf_counter()
    proof = w.prove(r1cs, witness, rng=rng)
    t2 = time.perf_counter()
    w.verify(r1cs, proof)  # raises on failure
    doc["inner_prove_s"] = round(t2 - t1, 2)
    doc["proof_bytes"] = len(proof)
    print(f"inner prove {t2 - t1:.2f}s, proof {len(proof)} bytes")

    c_comp = compress_cost()
    doc["constraints_per_compress"] = c_comp
    est = estimate(w, r1cs, c_comp)
    doc["estimate"] = est
    print(f"compress gadget: {c_comp} constraints")
    for k, v in est.items():
        print(f"  est {k:<28} {v:>12,}")

    def flush_doc():
        if out_path:
            pathlib.Path(out_path).write_text(json.dumps(doc, indent=1))

    flush_doc()

    # Synthesis with debug_assert: every emitted row is checked against the
    # host assignment, so a completed synthesis IS the satisfaction proof —
    # no packed-R1CS materialization (which costs O(wires) Python-int packs).
    from provekit_tpu.recursion.wrap import build_verifier_circuit
    t3 = time.perf_counter()
    builder = build_verifier_circuit(w, r1cs, proof, debug_assert=True)
    t4 = time.perf_counter()
    doc["synthesis_s"] = round(t4 - t3, 2)
    doc["wrapper_constraints"] = builder.num_constraints
    doc["wrapper_wires"] = builder.num_wires
    doc["wrapper_public_inputs"] = builder.num_public
    doc["wrapper_satisfied"] = True  # debug_assert: checked row by row
    print(f"synthesis {t4 - t3:.1f}s: {builder.num_constraints:,} "
          f"constraints, {builder.num_wires:,} wires, "
          f"{builder.num_public} public (every row host-checked)",
          flush=True)
    flush_doc()

    if builder.num_wires <= wrap_max:
        t5 = time.perf_counter()
        wrapper, _ = builder.build()
        doc["r1cs_build_s"] = round(time.perf_counter() - t5, 2)
        from provekit_tpu.recursion import groth16
        from provekit_tpu.recursion.wrap import lookup_challenges
        committed = builder.lookups.committed
        doc["committed_wires"] = len(committed)
        g16rng = random.Random(99)
        t7 = time.perf_counter()
        keys = groth16.setup(wrapper, rng=g16rng, committed=committed)
        t8 = time.perf_counter()
        print(f"groth16 setup {t8 - t7:.1f}s "
              f"({len(committed):,} committed wires)", flush=True)
        # derive the lookup challenges from the commitment, re-synthesize
        # with the real values (wrap.prove's two-pass flow, inlined so the
        # shape-check synthesis above is reused as pass 1)
        cvals = [builder.values[i] for i in committed]
        d_pt = groth16.commit(keys, cvals)
        builder2 = build_verifier_circuit(
            w, r1cs, proof, challenges=lookup_challenges(d_pt))
        assert [builder2.values[i] for i in committed] == cvals
        z = list(builder2.values)
        t85 = time.perf_counter()
        g16p = groth16.prove(keys, wrapper, z, rng=g16rng, d_pt=d_pt)
        t9 = time.perf_counter()
        publics = z[1:builder2.num_public + 1]
        ok = groth16.verify(keys, g16p, publics)
        t10 = time.perf_counter()
        doc["groth16_setup_s"] = round(t8 - t7, 2)
        doc["groth16_prove_s"] = round(t9 - t85, 2)
        doc["groth16_verify_s"] = round(t10 - t9, 3)
        doc["groth16_verified"] = bool(ok)
        print(f"groth16: setup {t8-t7:.1f}s prove {t9-t85:.1f}s "
              f"verify {t10-t9:.3f}s ok={ok}", flush=True)
        assert ok
    else:
        doc["groth16_skipped"] = (
            f"{builder.num_wires} wires > RECUR_WRAP_MAX={wrap_max}")
        print(doc["groth16_skipped"], flush=True)

    flush_doc()
    if out_path:
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
