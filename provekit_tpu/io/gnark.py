"""Gnark recursive-verifier config export.

Mirrors ``tooling/provekit-gnark/src/gnark_config.rs:11-149``: serializes the
two WHIR configs, scheme shape, IO pattern and transcript into the
``params_for_recursive_verifier`` JSON, plus the ``r1cs.json`` matrix dump
consumed by the Go circuit (``recursive-verifier/app/circuit/types.go:24-124``,
``matrix_evaluation.go:9-33``).
"""

from __future__ import annotations

import json
from pathlib import Path

from ..fields import bn254 as F
from ..protocol import WhirR1CSScheme
from ..r1cs import R1CS
from ..whir import WhirConfig


def whir_config_gnark(config: WhirConfig) -> dict:
    d = config.describe()
    return {
        "n_rounds": d["n_rounds"],
        "rate": d["rate"],
        "n_vars": d["n_vars"],
        "folding_factor": d["folding_factor"],
        "ood_samples": d["ood_samples"],
        "num_queries": d["num_queries"],
        "pow_bits": d["pow_bits"],
        "final_queries": d["final_queries"],
        "final_pow_bits": d["final_pow_bits"],
        "final_folding_pow_bits": d["final_folding_pow_bits"],
        "domain_generator": d["domain_generator"],
        "batch_size": d["batch_size"],
    }


def gnark_parameters(scheme: WhirR1CSScheme, transcript: bytes,
                     io_pattern: bytes) -> dict:
    return {
        "whir_config_witness": whir_config_gnark(scheme.whir_witness),
        "whir_config_hiding_spartan":
            whir_config_gnark(scheme.whir_for_hiding_spartan),
        "log_num_constraints": scheme.m_0,
        "log_num_variables": scheme.m,
        "log_a_num_terms": scheme.a_num_terms,
        "io_pattern": io_pattern.decode("utf-8", errors="replace"),
        "transcript": list(transcript),
        "transcript_len": len(transcript),
    }


def r1cs_to_gnark_json(r1cs: R1CS) -> dict:
    """Matrix dump with interned values (matrix_evaluation.go:9-33 mirror)."""
    def matrix(m):
        return {
            "num_rows": m.num_rows,
            "num_cols": m.num_cols,
            "entries": [[r, c, vid] for r, c, vid in
                        zip(m.rows, m.cols, m.value_ids)],
        }
    return {
        "interner": {"values": [str(v) for v in r1cs.interner.values]},
        "a": matrix(r1cs.a),
        "b": matrix(r1cs.b),
        "c": matrix(r1cs.c),
        "num_public_inputs": r1cs.num_public_inputs,
        "num_witnesses": r1cs.num_witnesses,
    }


def write_gnark_inputs(scheme: WhirR1CSScheme, r1cs: R1CS, transcript: bytes,
                       io_pattern: bytes, params_path, r1cs_path) -> None:
    Path(params_path).write_text(
        json.dumps(gnark_parameters(scheme, transcript, io_pattern)))
    Path(r1cs_path).write_text(json.dumps(r1cs_to_gnark_json(r1cs)))
