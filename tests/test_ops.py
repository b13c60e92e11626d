"""Tests for R1CS matvecs, sumcheck kernels, NTT/wavelet, Merkle, PoW."""

import random

import jax.numpy as jnp
import numpy as np

from provekit_tpu.fields import bn254 as F
from provekit_tpu.fields import vector as V
from provekit_tpu.hash import skyscraper as S
from provekit_tpu.ops import merkle, ntt, pow as powmod, sumcheck as sc
from provekit_tpu.r1cs import R1CS


def mont_pack(xs):
    return V.pack([F.to_mont(x) for x in xs])


def mont_unpack(arr):
    return [F.from_mont(v) for v in V.unpack(arr)]


# --- R1CS ------------------------------------------------------------------


def build_mul_r1cs():
    """z3 = z1*z2, z4 = z3 + z1  (witness: [1, z1, z2, z3, z4])."""
    r = R1CS()
    z1, z2, z3, z4 = (r.new_witness() for _ in range(4))
    r.add_constraint([(1, z1)], [(1, z2)], [(1, z3)])
    # (z3 + z1) * 1 = z4
    r.add_constraint([(1, z3), (1, z1)], [(1, 0)], [(1, z4)])
    return r


def test_r1cs_satisfaction():
    r = build_mul_r1cs()
    z = mont_pack([1, 3, 5, 15, 18])
    assert r.is_satisfied(z)
    bad = mont_pack([1, 3, 5, 15, 19])
    assert not r.is_satisfied(bad)


def test_matvec_matches_host():
    rng = random.Random(3)
    r = R1CS()
    n = 20
    idxs = [r.new_witness() for _ in range(n)]
    entries = []
    for row in range(8):
        a_terms = [(rng.randrange(F.P), rng.choice(idxs)) for _ in range(5)]
        b_terms = [(rng.randrange(F.P), rng.choice(idxs)) for _ in range(3)]
        c_terms = [(rng.randrange(F.P), rng.choice(idxs)) for _ in range(2)]
        r.add_constraint(a_terms, b_terms, c_terms)
        entries.append((a_terms, b_terms, c_terms))
    zs = [1] + [rng.randrange(F.P) for _ in range(n)]
    z = mont_pack(zs)
    az = mont_unpack(r.a.mul_right(z))
    for row, (a_terms, _, _) in enumerate(entries):
        want = sum(c * zs[w] for c, w in a_terms) % F.P
        assert az[row] == want, row
    # left-multiply e^T A
    es = [rng.randrange(F.P) for _ in range(r.num_constraints)]
    e = mont_pack(es)
    ea = mont_unpack(r.a.mul_left(e))
    want = [0] * r.num_witnesses
    for row, col, val in r.a.iter_entries():
        want[col] = (want[col] + es[row] * val) % F.P
    assert ea == want


# --- sumcheck kernels ------------------------------------------------------


def test_eq_table():
    rng = random.Random(4)
    rs = [rng.randrange(F.P) for _ in range(4)]
    table = mont_unpack(sc.eq_table(rs))
    for j in range(16):
        want = 1
        for k, r in enumerate(rs):
            bit = (j >> (3 - k)) & 1
            want = want * (r if bit else (1 - r)) % F.P
        assert table[j] == want, j
    assert sum(mont_unpack(sc.eq_table(rs))[j] for j in range(16)) % F.P == 1


def test_fold_and_eval():
    rng = random.Random(5)
    evals = [rng.randrange(F.P) for _ in range(8)]
    point = [rng.randrange(F.P) for _ in range(3)]
    got = sc.eval_multilinear(mont_pack(evals), point)
    # host reference: eval via eq-weights
    want = 0
    for j in range(8):
        w = 1
        for k, x in enumerate(point):
            bit = (j >> (2 - k)) & 1
            w = w * (x if bit else (1 - x)) % F.P
        want = (want + w * evals[j]) % F.P
    assert got == want


def test_spartan_round_sums():
    rng = random.Random(6)
    n = 8
    a = [rng.randrange(F.P) for _ in range(n)]
    b = [rng.randrange(F.P) for _ in range(n)]
    c = [rng.randrange(F.P) for _ in range(n)]
    e = [rng.randrange(F.P) for _ in range(n)]
    f0, fm1, finf = sc.spartan_round(mont_pack(a), mont_pack(b),
                                     mont_pack(c), mont_pack(e))
    h = n // 2

    def cubic_eval_at(x):
        total = 0
        for i in range(h):
            av = (a[i] + x * (a[i + h] - a[i])) % F.P
            bv = (b[i] + x * (b[i + h] - b[i])) % F.P
            cv = (c[i] + x * (c[i + h] - c[i])) % F.P
            ev = (e[i] + x * (e[i + h] - e[i])) % F.P
            total = (total + ev * ((av * bv - cv) % F.P)) % F.P
        return total

    assert F.from_mont(V.unpack_scalar(f0)) == cubic_eval_at(0)
    assert F.from_mont(V.unpack_scalar(fm1)) == cubic_eval_at(F.P - 1)
    # leading coefficient: sum of (e1-e0)(a1-a0)(b1-b0)
    lead = sum((e[i + h] - e[i]) * (a[i + h] - a[i]) * (b[i + h] - b[i])
               for i in range(h)) % F.P
    assert F.from_mont(V.unpack_scalar(finf)) == lead


# --- NTT / wavelet ---------------------------------------------------------


def test_ntt_roundtrip_and_reference():
    rng = random.Random(7)
    n = 16
    coeffs = [rng.randrange(F.P) for _ in range(n)]
    x = mont_pack(coeffs)
    evals = mont_unpack(ntt.ntt(x))
    w = F.root_of_unity(4)
    for k in [0, 1, 5, 15]:
        want = sum(coeffs[j] * pow(w, j * k, F.P) for j in range(n)) % F.P
        assert evals[k] == want, k
    back = mont_unpack(ntt.intt(ntt.ntt(x)))
    assert back == coeffs


def test_rs_encode():
    rng = random.Random(8)
    coeffs = [rng.randrange(F.P) for _ in range(8)]
    evals = mont_unpack(ntt.rs_encode(mont_pack(coeffs), 4))
    w = F.root_of_unity(4)
    want = sum(coeffs[j] * pow(w, j * 3, F.P) for j in range(8)) % F.P
    assert evals[3] == want


def test_wavelet_roundtrip_and_semantics():
    rng = random.Random(9)
    m = 3
    evals = [rng.randrange(F.P) for _ in range(1 << m)]
    x = mont_pack(evals)
    coeffs = mont_unpack(ntt.coeffs_of_evals(x))
    # multilinear eval at a point == univariate-embedded coeff eval
    point = [rng.randrange(F.P) for _ in range(m)]
    mle = sc.eval_multilinear(mont_pack(evals), point)
    # var k <-> monomial with index bit (m-1-k)
    acc = 0
    for j in range(1 << m):
        term = coeffs[j]
        for k in range(m):
            if (j >> (m - 1 - k)) & 1:
                term = term * point[k] % F.P
        acc = (acc + term) % F.P
    assert acc == mle
    back = mont_unpack(ntt.evals_of_coeffs(mont_pack(coeffs)))
    assert back == evals


def test_univariate_embedding():
    """f_multilinear(y^(2^(m-1)), ..., y^2, y) == sum c_j y^j."""
    rng = random.Random(10)
    m = 3
    evals = [rng.randrange(F.P) for _ in range(1 << m)]
    coeffs = mont_unpack(ntt.coeffs_of_evals(mont_pack(evals)))
    y = rng.randrange(F.P)
    uni = sum(c * pow(y, j, F.P) for j, c in enumerate(coeffs)) % F.P
    point = [pow(y, 1 << (m - 1 - k), F.P) for k in range(m)]
    assert sc.eval_multilinear(mont_pack(evals), point) == uni


# --- Merkle ----------------------------------------------------------------


def test_merkle_commit_open_verify():
    rng = random.Random(11)
    leaf_size, n = 4, 8
    vals = [[rng.randrange(F.P) for _ in range(leaf_size)] for _ in range(n)]
    flat = []
    for i in range(leaf_size):
        flat.extend(vals[j][i] for j in range(n))
    leaves = V.pack(flat).reshape(16, leaf_size, n)
    tree = merkle.commit(leaves)
    root = tree.root()
    paths = tree.open([0, 5])
    assert merkle.verify_path(root, vals[0], 0, paths[0])
    assert merkle.verify_path(root, vals[5], 5, paths[1])
    assert not merkle.verify_path(root, vals[5], 4, paths[1])
    bad = list(vals[0])
    bad[1] = (bad[1] + 1) % F.P
    assert not merkle.verify_path(root, bad, 0, paths[0])


# --- PoW -------------------------------------------------------------------


def test_pow_solve_verify():
    ch = 123456789
    for d in [0.0, 6.0]:
        nonce = powmod.solve(ch, d, block=512)
        assert powmod.verify(ch, d, nonce)
    assert not powmod.verify(ch, 40.0, 1)  # essentially impossible nonce
