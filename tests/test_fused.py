"""Fused-segment kernels: device sponge must match the host transcript."""

import random

import jax.numpy as jnp
import pytest

from provekit_tpu.fields import bn254 as F
from provekit_tpu.fields import vector as V
from provekit_tpu.fs import DomainSeparator
from provekit_tpu.ops import fused
from provekit_tpu.ops import sumcheck as sc


def mont_pack(xs):
    return V.pack([F.to_mont(x) for x in xs])


def test_whir_segment_matches_per_round(monkeypatch):
    rng = random.Random(11)
    n, count = 64, 3
    f = mont_pack([rng.randrange(F.P) for _ in range(n)])
    w = mont_pack([rng.randrange(F.P) for _ in range(n)])
    fw = jnp.stack([f, w], axis=1)

    ds = DomainSeparator("fused-test")
    for _ in range(count):
        ds.absorb(3, "c").squeeze(1, "a")

    # reference: per-round host transcript.  The wire basis is EVALUATIONS
    # [h(0), h(1), h(2)] (gnark whir_utilities.go:102-126), so the raw
    # quadratic sums from whir_round_stacked go through whir_round_messages
    # exactly as the fused segment and the per-round mesh driver do.
    tr1 = ds.to_prover_state()
    fw1, alphas1, coeffs1 = fw, [], []
    for _ in range(count):
        h = fused.whir_round_messages(*sc.whir_round_stacked(fw1))
        cs = [F.from_mont(V.unpack_scalar(x)) for x in h]
        coeffs1.append(cs)
        tr1.add_scalars(cs)
        a = tr1.challenge_scalars(1)[0]
        alphas1.append(a)
        fw1 = sc.fold_stacked_lsb(fw1, V.pack_scalar(F.to_mont(a)))

    # fused: one dispatch + host replay
    tr2 = ds.to_prover_state()
    st = tr2.sponge_state_array()
    fw2_full, st2, coeffs_arr, alphas_arr = fused.whir_sumcheck_segment(
        fw, st, count)
    fw2 = fw2_full[:, :, :n >> count]
    vals = V.unpack(coeffs_arr.reshape(16, count * 3))
    alphas2 = []
    for i in range(count):
        cs = vals[3 * i:3 * i + 3]
        assert cs == coeffs1[i], i
        tr2.add_scalars(cs)
        alphas2.append(tr2.challenge_scalars(1)[0])
    assert alphas2 == alphas1
    assert V.unpack(alphas_arr) == alphas1  # segment-returned challenges
    assert V.unpack(fw2.reshape(16, -1)) == V.unpack(fw1.reshape(16, -1))
    # device sponge state must equal host sponge state
    assert V.unpack(st2) == tr2.sponge.state


def test_e2e_through_fused_paths():
    # the prover is always device-resident now; this exercises it end to end
    from provekit_tpu.protocol import WhirR1CSScheme
    from provekit_tpu.r1cs import R1CS
    from provekit_tpu.whir.verifier import WhirError

    rng = random.Random(12)
    r = R1CS()
    prev = r.new_witness()
    vals = {0: 1, prev: rng.randrange(F.P)}
    for _ in range(6):
        nxt = r.new_witness()
        r.add_constraint([(1, prev)], [(1, prev)], [(1, nxt)])
        vals[nxt] = vals[prev] * vals[prev] % F.P
        prev = nxt
    witness = [vals[i] for i in range(r.num_witnesses)]

    scheme = WhirR1CSScheme.new_for_r1cs(r, security_level=30, max_pow_bits=6)
    proof = scheme.prove(r, witness, rng=random.Random(13))
    scheme.verify(r, proof)

    bad = bytearray(proof)
    bad[len(bad) // 2] ^= 1
    with pytest.raises((WhirError, ValueError)):
        scheme.verify(r, bytes(bad))
