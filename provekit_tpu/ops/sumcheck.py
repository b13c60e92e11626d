"""Sumcheck compute kernels: eq-tables, folds, cubic round sums.

TPU-native equivalents of the reference's fused rayon kernels
(``provekit/common/src/utils/sumcheck.rs:16-218``).  The per-round
fold-map-reduce becomes two whole-array passes (fold, then map+tree-reduce);
XLA fuses the elementwise chains, and the arrays halve every round.

Variable order convention (matches the reference): the FIRST challenge binds
the most-significant index bit — ``eq`` tables are built MSB-first and rounds
pair ``x[i]`` with ``x[i + n/2]``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..fields import bn254 as F
from ..fields import vector as V

# Below this size, ops run on the host (Python ints): tiny tail rounds are
# latency/compile-bound on device, and every distinct shape costs an XLA
# compile (this build machine has 2 CPUs — see docs/PARITY.md notes).
HOST_TAIL = int(os.environ.get("PROVEKIT_TPU_HOST_TAIL", "1024"))


def _host(arr) -> list[int]:
    return [F.from_mont(v) for v in V.unpack(arr)]


def _dev(vals: list[int]) -> jax.Array:
    return V.pack([F.to_mont(v) for v in vals])


def eq_table(rs: list[int]) -> jax.Array:
    """Evaluations of eq(r, x) over the boolean hypercube, (16, 2^m) Montgomery.

    Reference: ``calculate_evaluations_over_boolean_hypercube_for_eq``
    (sumcheck.rs:146-171).  Iterative doubling: E <- [E*(1-r_k), E*r_k].
    """
    # Process in reverse so rs[0] ends up on the most-significant index bit.
    # Small prefixes build on the host (avoids one device compile per size);
    # the remaining doublings run on device.
    host_vars = min(len(rs), 10)
    host = [1]
    for r in reversed(rs[len(rs) - host_vars:]):
        one_minus = F.sub(1, r)
        host = [x * one_minus % F.P for x in host] + [x * r % F.P for x in host]
    table = V.pack([F.to_mont(x) for x in host])
    for r in reversed(rs[:len(rs) - host_vars]):
        table = _eq_double(table, V.pack_scalar(F.to_mont(r)),
                           V.pack_scalar(F.to_mont(F.sub(1, r))))
    return table


@jax.jit
def _eq_double(table: jax.Array, r: jax.Array, one_minus_r: jax.Array) -> jax.Array:
    n = table.shape[1]
    rb = jnp.broadcast_to(r[:, None], (16, n))
    ob = jnp.broadcast_to(one_minus_r[:, None], (16, n))
    return jnp.concatenate([V.mont_mul(table, ob), V.mont_mul(table, rb)], axis=1)


def eq_point(rs: list[int], alphas: list[int]) -> int:
    """eq(r, alpha) as a host scalar (sumcheck.rs:196-202)."""
    acc = 1
    for r, a in zip(rs, alphas):
        acc = acc * (r * a + (1 - r) * (1 - a)) % F.P
    return acc % F.P


def _is_traced(*xs) -> bool:
    return any(isinstance(x, jax.core.Tracer) for x in xs)


@jax.jit
def _fold_dev(x: jax.Array, alpha: jax.Array) -> jax.Array:
    n = x.shape[1]
    lo, hi = x[:, :n // 2], x[:, n // 2:]
    ab = jnp.broadcast_to(alpha[:, None], (16, n // 2))
    return V.add_mod(lo, V.mont_mul(ab, V.sub_mod(hi, lo)))


def fold(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Bind the MSB variable to alpha: (16, n) -> (16, n/2).

    x' = lo + alpha * (hi - lo), lo/hi the two halves.
    Small sizes run on the host (one XLA compile per shape otherwise).
    """
    n = x.shape[1]
    if n <= HOST_TAIL and not _is_traced(x, alpha):
        xs = _host(x)
        a = F.from_mont(V.unpack_scalar(alpha))
        h = n // 2
        return _dev([(xs[i] + a * (xs[i + h] - xs[i])) % F.P for i in range(h)])
    return _fold_dev(x, alpha)


def spartan_round(a, b, c, eq):
    """Dispatch wrapper: host tail for small sizes (see _spartan_round_dev)."""
    n = a.shape[1]
    if n <= HOST_TAIL and not _is_traced(a, b, c, eq):
        av, bv, cv, ev = _host(a), _host(b), _host(c), _host(eq)
        h = n // 2
        f0 = fm1 = finf = 0
        for i in range(h):
            a0, a1 = av[i], av[i + h]
            b0, b1 = bv[i], bv[i + h]
            c0, c1 = cv[i], cv[i + h]
            e0, e1 = ev[i], ev[i + h]
            f0 += e0 * (a0 * b0 - c0)
            fm1 += (2 * e0 - e1) * ((2 * a0 - a1) * (2 * b0 - b1) - (2 * c0 - c1))
            finf += (e1 - e0) * (a1 - a0) * (b1 - b0)
        return (V.pack_scalar(F.to_mont(f0 % F.P)),
                V.pack_scalar(F.to_mont(fm1 % F.P)),
                V.pack_scalar(F.to_mont(finf % F.P)))
    return _spartan_round_dev(a, b, c, eq)


@jax.jit
def _spartan_round_dev(a: jax.Array, b: jax.Array, c: jax.Array, eq: jax.Array):
    """One Spartan sumcheck round over F(x) = eq(x) * (a(x) b(x) - c(x)).

    Returns the three cubic evaluations the prover sends
    (``run_zk_sumcheck_prover``'s map closure, prover/src/whir_r1cs.rs:284-291):
    sum F at X=0, at X=-1, and the X^3 leading coefficient.
    All inputs (16, n) Montgomery; outputs three (16,) Montgomery scalars.
    """
    n = a.shape[1]
    h = n // 2
    a0, a1 = a[:, :h], a[:, h:]
    b0, b1 = b[:, :h], b[:, h:]
    c0, c1 = c[:, :h], c[:, h:]
    e0, e1 = eq[:, :h], eq[:, h:]

    def dbl_sub(x0, x1):  # 2*x0 - x1  (evaluation at X=-1 along the line)
        return V.sub_mod(V.add_mod(x0, x0), x1)

    f0 = V.mont_mul(e0, V.sub_mod(V.mont_mul(a0, b0), c0))
    fm1 = V.mont_mul(
        dbl_sub(e0, e1),
        V.sub_mod(V.mont_mul(dbl_sub(a0, a1), dbl_sub(b0, b1)), dbl_sub(c0, c1)))
    finf = V.mont_mul(V.sub_mod(e1, e0),
                      V.mont_mul(V.sub_mod(a1, a0), V.sub_mod(b1, b0)))
    return V.sum_mod(f0), V.sum_mod(fm1), V.sum_mod(finf)


def weighted_sum(weights: jax.Array, values: jax.Array) -> jax.Array:
    """Modular dot product <weights, values>: (16,n)x(16,n) -> (16,)."""
    from .. import config
    if (config.CHEAP_SYNC and weights.shape[1] <= HOST_TAIL
            and not _is_traced(weights, values)):
        ws, vs = _host(weights), _host(values)
        acc = 0
        for w, v in zip(ws, vs):
            acc += w * v
        return _dev([acc % F.P]).reshape(16)
    return _weighted_sum_jit(weights, values)


@jax.jit
def _weighted_sum_jit(weights: jax.Array, values: jax.Array) -> jax.Array:
    return V.sum_mod(V.mont_mul(weights, values))


def eval_multilinear(evals: jax.Array, point: list[int]) -> int:
    """Evaluate an MLE given by hypercube evals at a point (MSB-first).

    evals: (16, 2^m) Montgomery; returns a canonical host int.  ONE device
    dispatch + ONE fetch (a per-variable fold loop costs a ~30 ms transfer
    round trip per variable on tunneled devices).
    """
    return eval_multilinear_batch(evals, [point])[0]


def eval_cubic(coeffs: list[int], x: int) -> int:
    """Horner eval of a polynomial given coefficients [c0..] (host scalars)."""
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % F.P
    return acc


# --- stacked variants: K polynomials folded in one dispatch ----------------


@jax.jit
def _fold_stacked_msb_dev(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """(16, K, n) -> (16, K, n/2), binding the MSB variable of each."""
    n = x.shape[2]
    lo, hi = x[:, :, :n // 2], x[:, :, n // 2:]
    ab = jnp.broadcast_to(alpha[:, None, None], lo.shape)
    return V.add_mod(lo, V.mont_mul(ab, V.sub_mod(hi, lo)))


def fold_stacked_msb(x: jax.Array, alpha) -> jax.Array:
    if x.shape[2] * x.shape[1] <= HOST_TAIL and not _is_traced(x, alpha):
        k, n = x.shape[1], x.shape[2]
        a = F.from_mont(V.unpack_scalar(alpha))
        xs = _host(x.reshape(16, k * n))
        h = n // 2
        out = []
        for j in range(k):
            row = xs[j * n:(j + 1) * n]
            out.extend((row[i] + a * (row[i + h] - row[i])) % F.P
                       for i in range(h))
        return _dev(out).reshape(16, k, h)
    return _fold_stacked_msb_dev(x, alpha)


@jax.jit
def _fold_stacked_lsb_dev(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """(16, K, n) -> (16, K, n/2), binding the LSB variable of each."""
    ev, od = x[:, :, 0::2], x[:, :, 1::2]
    ab = jnp.broadcast_to(alpha[:, None, None], ev.shape)
    return V.add_mod(ev, V.mont_mul(ab, V.sub_mod(od, ev)))


def fold_stacked_lsb(x: jax.Array, alpha) -> jax.Array:
    if x.shape[2] * x.shape[1] <= HOST_TAIL and not _is_traced(x, alpha):
        k, n = x.shape[1], x.shape[2]
        a = F.from_mont(V.unpack_scalar(alpha))
        xs = _host(x.reshape(16, k * n))
        out = []
        for j in range(k):
            row = xs[j * n:(j + 1) * n]
            out.extend((row[2 * i] + a * (row[2 * i + 1] - row[2 * i])) % F.P
                       for i in range(n // 2))
        return _dev(out).reshape(16, k, n // 2)
    return _fold_stacked_lsb_dev(x, alpha)


@jax.jit
def _spartan_round_stacked_dev(abce: jax.Array):
    return _spartan_round_dev(abce[:, 0], abce[:, 1], abce[:, 2], abce[:, 3])


def spartan_round_stacked(abce: jax.Array):
    """spartan_round on a stacked (16, 4, n) [a;b;c;eq] array (1 dispatch)."""
    n = abce.shape[2]
    if n <= HOST_TAIL and not _is_traced(abce):
        xs = _host(abce.reshape(16, 4 * n))
        av, bv, cv, ev = (xs[j * n:(j + 1) * n] for j in range(4))
        h = n // 2
        f0 = fm1 = finf = 0
        for i in range(h):
            a0, a1 = av[i], av[i + h]
            b0, b1 = bv[i], bv[i + h]
            c0, c1 = cv[i], cv[i + h]
            e0, e1 = ev[i], ev[i + h]
            f0 += e0 * (a0 * b0 - c0)
            fm1 += (2 * e0 - e1) * ((2 * a0 - a1) * (2 * b0 - b1) - (2 * c0 - c1))
            finf += (e1 - e0) * (a1 - a0) * (b1 - b0)
        return (V.pack_scalar(F.to_mont(f0 % F.P)),
                V.pack_scalar(F.to_mont(fm1 % F.P)),
                V.pack_scalar(F.to_mont(finf % F.P)))
    return _spartan_round_stacked_dev(abce)


@jax.jit
def _whir_round_stacked_dev(fw: jax.Array):
    return _whir_round_dev(fw[:, 0], fw[:, 1])


@jax.jit
def whir_round_split_dev(fw: jax.Array):
    """One WHIR round with the even/odd deinterleave done ONCE.

    fw (16, 2, n) -> (ev (16,2,n/2), d (16,2,n/2), h0, h1, h2).  The
    stride-2 lane slices are the expensive part of an LSB round on TPU
    (sub-lane relayouts); sharing them between the round sums and the fold
    (``fold_from_split_dev``: ev + alpha*d, all contiguous) halves the
    strided passes vs whir_round_stacked + fold_stacked_lsb.  Limb ops are
    identical — transcripts stay byte-exact.
    """
    ev, od = fw[:, :, 0::2], fw[:, :, 1::2]
    d = V.sub_mod(od, ev)
    f0, w0 = ev[:, 0], ev[:, 1]
    df, dw = d[:, 0], d[:, 1]
    h0 = V.sum_mod(V.mont_mul(f0, w0))
    h1 = V.sum_mod(V.add_mod(V.mont_mul(f0, dw), V.mont_mul(w0, df)))
    h2 = V.sum_mod(V.mont_mul(df, dw))
    return ev, d, h0, h1, h2


@jax.jit
def fold_from_split_dev(ev: jax.Array, d: jax.Array,
                        alpha: jax.Array) -> jax.Array:
    """(16,2,h) halves from whir_round_split_dev -> folded (16,2,h)."""
    ab = jnp.broadcast_to(alpha[:, None, None], ev.shape)
    return V.add_mod(ev, V.mont_mul(ab, d))


def whir_round_stacked(fw: jax.Array):
    """whir_round on a stacked (16, 2, n) [f;w] array (1 dispatch)."""
    n = fw.shape[2]
    if n <= HOST_TAIL and not _is_traced(fw):
        xs = _host(fw.reshape(16, 2 * n))
        fv, wv = xs[:n], xs[n:]
        h0 = h1 = h2 = 0
        for i in range(n // 2):
            f0, f1 = fv[2 * i], fv[2 * i + 1]
            w0, w1 = wv[2 * i], wv[2 * i + 1]
            df, dw = f1 - f0, w1 - w0
            h0 += f0 * w0
            h1 += f0 * dw + w0 * df
            h2 += df * dw
        return (V.pack_scalar(F.to_mont(h0 % F.P)),
                V.pack_scalar(F.to_mont(h1 % F.P)),
                V.pack_scalar(F.to_mont(h2 % F.P)))
    return _whir_round_stacked_dev(fw)


def _pack_point_batch(coords_list: list[list[int]], m: int, extra=None):
    """-> (rs, omrs [, extra_arr]) stacked as (16, m, P_pad) device arrays."""
    p = len(coords_list)
    p_pad = 1 << max(0, (p - 1).bit_length())
    padded = list(coords_list) + [[0] * m] * (p_pad - p)
    flat_r, flat_o = [], []
    for k in range(m):
        flat_r.extend(F.to_mont(c[k]) for c in padded)
        flat_o.extend(F.to_mont(F.sub(1, c[k])) for c in padded)
    rs = V.pack(flat_r).reshape(16, m, p_pad)
    omrs = V.pack(flat_o).reshape(16, m, p_pad)
    return rs, omrs, p_pad


@functools.partial(jax.jit, static_argnums=(3,))
def _eq_batch_dev(rs, omrs, start, m: int):
    """start (16,P,1) -> (16, P, 2^m) tables scaled by start (single jit)."""
    e = start
    for k in range(m - 1, -1, -1):
        lo = V.mont_mul(e, jnp.broadcast_to(omrs[:, k, :, None], e.shape))
        hi = V.mont_mul(e, jnp.broadcast_to(rs[:, k, :, None], e.shape))
        e = jnp.concatenate([lo, hi], axis=2)
    return e


# Element cap for any single mont_mul batch inside eq combine/eval.  A
# B-element mont_mul transiently materializes tens of (32, B) u32 column
# arrays; the direct (P, 2^m) table build OOMed a 16 GB v5e at reference
# parameters (u32[32,128,2^15] temps x20 in BENCH_r02).  2^19 keeps the
# transient working set around ~25-50 MB per chunk.
_EQ_CHUNK = int(os.environ.get("PROVEKIT_TPU_EQ_CHUNK", str(1 << 19)))


def _eq_split(rs, omrs, scale, m: int):
    """Factorize P eq-tables: (hi (16,P,2^mh) scaled, lo (16,P,2^ml)).

    table_p[jhi * 2^ml + jlo] == hi_p[jhi] * lo_p[jlo]; coords 0..mh-1 are
    the index MSBs (same bit order as :func:`_eq_batch_dev`).
    """
    mh = m // 2
    ml = m - mh
    p = rs.shape[2]
    hi = _eq_batch_dev(rs[:, :mh], omrs[:, :mh], scale, mh)
    one = V.broadcast_scalar(jnp.asarray(V.R_LIMBS), (p, 1))
    lo = _eq_batch_dev(rs[:, mh:], omrs[:, mh:], one, ml)
    return hi, lo, mh, ml


def _hi_block(mh: int, ml: int) -> tuple[int, int]:
    """Power-of-two hi-axis block size keeping block * 2^ml <= _EQ_CHUNK."""
    hb = 1 << min(mh, max(0, (_EQ_CHUNK >> ml).bit_length() - 1))
    return hb, (1 << mh) // hb


@functools.partial(jax.jit, static_argnums=(3,))
def _eq_combine_dev(rs, omrs, coeffs, m: int):
    """sum_p coeffs[p] * eq(r_p, .) as a (16, 2^m) table, memory-bounded.

    Direct build for small tables; otherwise each point's table is the
    outer product of two half-tables, accumulated point-by-point with a
    ``lax.scan`` whose inner blocks never exceed ~_EQ_CHUNK elements (the
    direct (P, 2^m) build peaks at P * 2^m * ~50 u32s of HBM temps).
    """
    p = rs.shape[2]
    if (1 << m) * p <= _EQ_CHUNK:
        e = _eq_batch_dev(rs, omrs, coeffs[:, :, None], m)
        while e.shape[1] > 1:
            h = e.shape[1] // 2
            e = V.add_mod(e[:, :h], e[:, h:])
        return e.reshape(16, e.shape[2])

    hi, lo, mh, ml = _eq_split(rs, omrs, coeffs[:, :, None], m)
    nlo = 1 << ml
    hb, nb = _hi_block(mh, ml)

    def point_step(acc, xs):
        hi_p, lo_p = xs                                   # (16,2^mh),(16,nlo)
        hib = hi_p.reshape(16, nb, hb)
        lob = jnp.broadcast_to(lo_p[:, None, None, :], (16, 1, hb, nlo))

        def blk(i, acc):
            h = jax.lax.dynamic_slice_in_dim(hib, i, 1, axis=1)
            prod = V.mont_mul(
                jnp.broadcast_to(h[..., None], (16, 1, hb, nlo)), lob)
            cur = jax.lax.dynamic_slice_in_dim(acc, i, 1, axis=1)
            return jax.lax.dynamic_update_slice_in_dim(
                acc, V.add_mod(cur, prod), i, axis=1)

        return jax.lax.fori_loop(0, nb, blk, acc), None

    acc0 = jnp.zeros((16, nb, hb, nlo), dtype=V.U32)
    xs = (jnp.moveaxis(hi, 1, 0), jnp.moveaxis(lo, 1, 0))
    acc, _ = jax.lax.scan(point_step, acc0, xs)
    return acc.reshape(16, 1 << m)


def combine_eq_weights(coords_list: list[list[int]], coeffs: list[int],
                       m: int) -> jax.Array:
    """sum_i coeffs[i] * eq(coords_i, .) as one (16, 2^m) Montgomery table.

    Batched across points so a WHIR round's weight update is ONE device
    dispatch instead of O(points * m) — critical over high-latency device
    transports.  Pads the point batch to a power of two with zero coeffs.
    """
    p = len(coords_list)
    assert p == len(coeffs) and p > 0
    rs, omrs, p_pad = _pack_point_batch(coords_list, m)
    cf = V.pack([F.to_mont(c) for c in coeffs] + [0] * (p_pad - p))
    return _eq_combine_dev(rs, omrs, cf, m)


def _pad_points(coords_m: jax.Array):
    """(16, m, p) -> ((16, m, P2) rs, omrs, p) with zero-padded points."""
    p = coords_m.shape[2]
    p_pad = 1 << max(0, (p - 1).bit_length())
    if p_pad > p:
        coords_m = jnp.pad(coords_m, [(0, 0), (0, 0), (0, p_pad - p)])
    one = jnp.broadcast_to(jnp.asarray(V.R_LIMBS)[:, None, None],
                           coords_m.shape)
    return coords_m, V.sub_mod(one, coords_m), p_pad


def _host_points(coords_m: jax.Array, m: int) -> list[list[int]]:
    """(16, m, p) Montgomery device coords -> p host point lists."""
    p = coords_m.shape[2]
    flat = _host(coords_m.reshape(16, m * p))
    return [[flat[k * p + j] for k in range(m)] for j in range(p)]


def combine_eq_weights_dev(coords_m: jax.Array, coeffs_m: jax.Array,
                           m: int) -> jax.Array:
    """sum_i coeffs[i] * eq(coords_i, .) from DEVICE Montgomery inputs.

    coords_m (16, m, p), coeffs_m (16, p) -> (16, 2^m) Montgomery table.
    Device-scalar twin of :func:`combine_eq_weights` (no host sync unless
    syncs are declared cheap — config.CHEAP_SYNC — and the table is tiny)."""
    from .. import config
    p = coords_m.shape[2]
    if (config.CHEAP_SYNC and (1 << m) <= HOST_TAIL and p <= 256
            and not _is_traced(coords_m, coeffs_m)):
        points = _host_points(coords_m, m)
        cfs = _host(coeffs_m)
        table = [0] * (1 << m)
        for c, cf in zip(points, cfs):
            e = [1]
            for r in reversed(c):
                omr = (1 - r) % F.P
                e = ([x * omr % F.P for x in e]
                     + [x * r % F.P for x in e])
            for i, x in enumerate(e):
                table[i] = (table[i] + cf * x) % F.P
        return _dev(table)
    rs, omrs, p_pad = _pad_points(coords_m)
    if p_pad > p:
        coeffs_m = jnp.pad(coeffs_m, [(0, 0), (0, p_pad - p)])
    return _eq_combine_dev(rs, omrs, coeffs_m, m)


def eval_multilinear_batch_dev(evals: jax.Array,
                               coords_m: jax.Array) -> jax.Array:
    """MLE evaluations at device points: (16, m, p) -> (16, p) Montgomery."""
    from .. import config
    m = coords_m.shape[1]
    p = coords_m.shape[2]
    if (config.CHEAP_SYNC and evals.shape[1] <= HOST_TAIL and p <= 256
            and not _is_traced(evals, coords_m)):
        ev = _host(evals)
        outs = []
        for c in _host_points(coords_m, m):
            v = ev
            for r in c:  # MSB-first folds
                h = len(v) // 2
                v = [(v[i] + r * (v[i + h] - v[i])) % F.P for i in range(h)]
            outs.append(v[0])
        return _dev(outs)
    rs, omrs, p_pad = _pad_points(coords_m)
    one = V.broadcast_scalar(jnp.asarray(V.R_LIMBS), (p_pad, 1))
    return _eval_batch_dev(rs, omrs, one, evals, m)[:, :p]


@functools.partial(jax.jit, static_argnums=(4,))
def _eval_batch_dev(rs, omrs, start, evals, m: int):
    """<eq(r_p, .), evals> per point, memory-bounded like _eq_combine_dev.

    Uses the eq factorization: sum_j ev[j] eq_p[j] =
    sum_jhi hi_p[jhi] * (sum_jlo ev[jhi, jlo] * lo_p[jlo]).
    """
    p = rs.shape[2]
    if (1 << m) * p <= _EQ_CHUNK:
        tables = _eq_batch_dev(rs, omrs, start, m)
        prod = V.mont_mul(tables, evals[:, None, :])
        return V.sum_mod(prod, axis=2)

    hi, lo, mh, ml = _eq_split(rs, omrs, start, m)
    nhi, nlo = 1 << mh, 1 << ml
    hb, nb = _hi_block(mh, ml)
    ev2 = evals.reshape(16, nhi, nlo)

    def point_step(_, xs):
        hi_p, lo_p = xs
        lob = jnp.broadcast_to(lo_p[:, None, :], (16, hb, nlo))

        def blk(i, acc):
            evb = jax.lax.dynamic_slice_in_dim(ev2, i * hb, hb, axis=1)
            partial = V.sum_mod(V.mont_mul(evb, lob), axis=2)  # (16, hb)
            return jax.lax.dynamic_update_slice_in_dim(acc, partial,
                                                       i * hb, axis=1)

        partials = jax.lax.fori_loop(
            0, nb, blk, jnp.zeros((16, nhi), dtype=V.U32))
        return None, V.sum_mod(V.mont_mul(partials, hi_p), axis=1)

    _, vals = jax.lax.scan(point_step, None,
                           (jnp.moveaxis(hi, 1, 0), jnp.moveaxis(lo, 1, 0)))
    return jnp.moveaxis(vals, 0, 1)


def eval_multilinear_batch(evals: jax.Array,
                           coords_list: list[list[int]]) -> list[int]:
    """MLE evaluations at many points (single device dispatch).

    The result is host ints (a sync happens either way); small concrete
    tables fold on the host directly — one fetch, zero compiles."""
    if evals.shape[1] <= HOST_TAIL and not _is_traced(evals):
        ev = _host(evals)
        outs = []
        for c in coords_list:
            v = ev
            for r in c:  # MSB-first folds
                h = len(v) // 2
                v = [(v[i] + r * (v[i + h] - v[i])) % F.P for i in range(h)]
            outs.append(v[0])
        return outs
    m = len(coords_list[0])
    p = len(coords_list)
    rs, omrs, p_pad = _pack_point_batch(coords_list, m)
    one = V.broadcast_scalar(jnp.asarray(V.R_LIMBS), (p_pad, 1))
    sums = _eval_batch_dev(rs, omrs, one, evals, m)
    vals = V.unpack(sums)
    return [F.from_mont(v) for v in vals[:p]]


# --- LSB-order kernels (WHIR folding order) --------------------------------


@jax.jit
def _fold_lsb_dev(x: jax.Array, alpha: jax.Array) -> jax.Array:
    n = x.shape[1]
    ev = x[:, 0::2]
    od = x[:, 1::2]
    ab = jnp.broadcast_to(alpha[:, None], (16, n // 2))
    return V.add_mod(ev, V.mont_mul(ab, V.sub_mod(od, ev)))


def fold_lsb(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Bind the LSB variable to alpha (WHIR order): pairs (x[2i], x[2i+1]).

    x' = even + alpha * (odd - even); works for evaluation vectors.
    """
    n = x.shape[1]
    if n <= HOST_TAIL and not _is_traced(x, alpha):
        xs = _host(x)
        a = F.from_mont(V.unpack_scalar(alpha))
        return _dev([(xs[2 * i] + a * (xs[2 * i + 1] - xs[2 * i])) % F.P
                     for i in range(n // 2)])
    return _fold_lsb_dev(x, alpha)


def whir_round(f: jax.Array, w: jax.Array):
    """One WHIR sumcheck round on h(X) = sum_x f(x,X) w(x,X), LSB binding.

    Returns the three coefficients [h0, h1, h2] of the quadratic round
    polynomial as (16,) Montgomery scalars.
    """
    n = f.shape[1]
    if n <= HOST_TAIL and not _is_traced(f, w):
        fv, wv = _host(f), _host(w)
        h0 = h1 = h2 = 0
        for i in range(n // 2):
            f0, f1 = fv[2 * i], fv[2 * i + 1]
            w0, w1 = wv[2 * i], wv[2 * i + 1]
            df, dw = f1 - f0, w1 - w0
            h0 += f0 * w0
            h1 += f0 * dw + w0 * df
            h2 += df * dw
        return (V.pack_scalar(F.to_mont(h0 % F.P)),
                V.pack_scalar(F.to_mont(h1 % F.P)),
                V.pack_scalar(F.to_mont(h2 % F.P)))
    return _whir_round_dev(f, w)


@jax.jit
def _whir_round_dev(f: jax.Array, w: jax.Array):
    f0, f1 = f[:, 0::2], f[:, 1::2]
    w0, w1 = w[:, 0::2], w[:, 1::2]
    df = V.sub_mod(f1, f0)
    dw = V.sub_mod(w1, w0)
    h0 = V.sum_mod(V.mont_mul(f0, w0))
    h1 = V.sum_mod(V.add_mod(V.mont_mul(f0, dw), V.mont_mul(w0, df)))
    h2 = V.sum_mod(V.mont_mul(df, dw))
    return h0, h1, h2


def eval_multilinear_lsb(evals: jax.Array, binders: list[int]) -> jax.Array:
    """Bind variables LSB-first with successive scalars; returns remaining."""
    x = evals
    for b in binders:
        x = fold_lsb(x, V.pack_scalar(F.to_mont(b)))
    return x
