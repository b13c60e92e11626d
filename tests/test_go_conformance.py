"""Go-verifier parse conformance: the exported gnark inputs must walk.

A Python mirror of the unmodified Go recursive-verifier's parse phase
(``io/go_parse.py`` <- common.go:15-130, utilities.go:245-277) consumes the
ACTUAL exported ``params_for_recursive_verifier`` + ``r1cs.json`` files and
checks structural equality field-for-field.  This pins the export surface:
any drift in ``io/gnark.py``, the IO-pattern string, the hint framing, or
the ark wire formats breaks this test loudly (VERDICT r3 item 6; the
reference proves the same property by running the Go binary in CI,
end-to-end.yml:44-84).
"""

import json
import random

import pytest

from provekit_tpu.fields import bn254 as F
from provekit_tpu.io import gnark, go_parse
from tests.test_e2e import build_system
from tests.test_verifier_circuit import tiny_scheme


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gnark")
    r1cs, witness = build_system(seed=7, n_mults=3)
    scheme = tiny_scheme(r1cs, security=10, folding=2, max_pow=2)
    proof = scheme.prove(r1cs, witness, rng=random.Random(5))
    scheme.verify(r1cs, proof)
    io_pattern = scheme.create_io_pattern().as_bytes()
    gnark.write_gnark_inputs(scheme, r1cs, proof, io_pattern,
                             tmp / "params", tmp / "r1cs.json")
    config = json.loads((tmp / "params").read_text())
    r1cs_doc = json.loads((tmp / "r1cs.json").read_text())
    return scheme, r1cs, proof, config, r1cs_doc


def test_full_parse_walk(exported):
    scheme, r1cs, proof, config, r1cs_doc = exported
    out = go_parse.prepare(config, r1cs_doc)
    parsed = out["parsed"]

    # opening counts: one first-round + n_rounds + final per WHIR instance
    n_open_w = len(scheme.whir_witness.rounds) + 1
    n_open_b = len(scheme.whir_for_hiding_spartan.rounds) + 1
    assert len(parsed.merkle_paths) == n_open_w + n_open_b
    assert len(parsed.stir_answers) == n_open_w + n_open_b

    # deferred_weight_evaluations: both hints concatenated (common.go:73)
    f_sums, g_sums = parsed.claimed_evaluations
    assert len(f_sums) == 3 and len(g_sums) == 3

    # the Go-side "truncated" transcript is exactly the absorbed scalars
    # (+ raw 8-byte pow nonces, common.go:93-96 size-bytes branch)
    io = scheme.create_io_pattern()
    absorbed = sum(
        op.count if op.label == "pow-nonce" else op.count * 32
        for op in io.ops if op.kind == "A")
    assert len(parsed.truncated) == absorbed

    # interner round-trip
    assert out["interner"] == list(r1cs.interner.values)

    # consumption order: hiding-spartan instance drains first (common.go:122)
    hiding, witness_hint = out["hiding_spartan_hint"], out["witness_hint"]
    assert hiding.first_round is not None
    assert len(hiding.rounds) == len(scheme.whir_for_hiding_spartan.rounds)
    assert witness_hint.first_round is not None
    assert len(witness_hint.rounds) == len(scheme.whir_witness.rounds)


def test_config_schema_field_for_field(exported):
    scheme, _r1cs, proof, config, _ = exported
    # every Go Config json tag present, and nothing the Go side would drop
    assert set(config.keys()) == set(go_parse.CONFIG_KEYS)
    for key in ("whir_config_witness", "whir_config_hiding_spartan"):
        assert set(config[key].keys()) == set(go_parse.WHIR_CONFIG_KEYS)
    wc = config["whir_config_witness"]
    # array lengths: one entry per round for ood/queries/pow; folding factor
    # has the initial entry too (gnark_config.rs:60-98)
    assert len(wc["ood_samples"]) == wc["n_rounds"]
    assert len(wc["num_queries"]) == wc["n_rounds"]
    assert len(wc["pow_bits"]) == wc["n_rounds"]
    assert len(wc["folding_factor"]) == wc["n_rounds"] + 1
    assert wc["batch_size"] == 2
    assert wc["n_vars"] == scheme.m
    assert config["transcript"] == list(proof)
    assert config["log_num_constraints"] == scheme.m_0
    assert config["log_num_variables"] == scheme.m
    # domain_generator is the decimal generator of the starting domain
    g = int(wc["domain_generator"])
    order = 1 << scheme.whir_witness.starting_log_domain
    assert pow(g, order, F.P) == 1 and pow(g, order // 2, F.P) != 1
    # statement evaluations parse as decimal field elements
    assert [int(v) < F.P for v in config["witness_statement_evaluations"]]
    assert len(config["witness_statement_evaluations"]) == 3


def test_stir_answers_match_multipath_indexes(exported):
    scheme, _r1cs, _proof, config, r1cs_doc = exported
    out = go_parse.prepare(config, r1cs_doc)
    for (indexes, sibs, paths), answers in zip(
            out["parsed"].merkle_paths, out["parsed"].stir_answers):
        # one leaf answer per deduped opened index, same order
        assert len(answers) == len(indexes)
        assert len(sibs) == len(indexes)
        assert len(paths) == len(indexes)
        assert indexes == sorted(set(indexes))
        # uniform leaf arity per opening
        assert len({len(a) for a in answers}) <= 1


def test_walk_rejects_drift(exported):
    scheme, _r1cs, _proof, config, r1cs_doc = exported
    # truncating the transcript must break the walk (unconsumed/overrun)
    bad = dict(config)
    bad["transcript"] = config["transcript"][:-40]
    bad["transcript_len"] = len(bad["transcript"])
    with pytest.raises(ValueError):
        go_parse.prepare(bad, r1cs_doc)
    # dropping a config field must be detected
    bad2 = {k: v for k, v in config.items() if k != "log_a_num_terms"}
    with pytest.raises(ValueError, match="log_a_num_terms"):
        go_parse.prepare(bad2, r1cs_doc)
