"""Device-resident Fiat-Shamir: sponge, transcript buffers, scalar algebra.

On a remote/tunneled TPU every host<->device interaction costs a ~30 ms
round trip, so a prove that touches the host sponge per absorb/squeeze is
latency-bound (hundreds of syncs).  This module keeps the ENTIRE prover
transcript on device:

* the duplex sponge state (16, 2) advances with jitted absorb/squeeze ops
  (canonical form; Skyscraper's S-step IS the Montgomery square, see
  ``hash.skyscraper``), with absorb positions tracked on the host — the op
  pattern is static per scheme so no data ever needs to come back;
* absorbed scalars accumulate in device chunks; hint payloads are recorded
  as device arrays plus a host serializer callback;
* ``narg_string()`` performs ONE device->host fetch of a single packed
  buffer and assembles the byte transcript — identical bytes to the host
  ``ProverState`` path (differentially tested).

The verifier replays the transcript with the host sponge, unchanged.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import bn254 as F
from ..fields import vector as V
from .transcript import DomainSeparator, _OpChecker

RATE = 1


# ---------------------------------------------------------------------------
# device scalar algebra ((16, k) uint32 limb arrays)


def _c(x: int) -> jax.Array:
    return V.pack([x % F.P])


# Host tails for the scalar-algebra builders: when syncs are declared cheap
# (config.CHEAP_SYNC — CPU-hermetic flows) and inputs are concrete, tiny
# power/coordinate/eq tables are computed as exact host ints instead of
# compiling a fresh unrolled device executable per shape (~5-25 s each on
# compile-bound hosts).  Bit-identical by construction.


def _cheap(*xs) -> bool:
    from .. import config
    return (config.CHEAP_SYNC
            and not any(isinstance(x, jax.core.Tracer) for x in xs))


def _host_monts(a: jax.Array) -> list[int]:
    return [F.from_mont(v) for v in V.unpack(a)]


def _pack_mont(vals) -> jax.Array:
    return V.pack([F.to_mont(v % F.P) for v in vals])


@jax.jit
def to_mont(a: jax.Array) -> jax.Array:
    r2 = jnp.asarray(V.R2_LIMBS)
    return V.mont_mul(a, jnp.broadcast_to(r2[:, None], a.shape))


@jax.jit
def from_mont(a: jax.Array) -> jax.Array:
    one = jnp.asarray(V.ONE_LIMBS)
    return V.mont_mul(a, jnp.broadcast_to(one[:, None], a.shape))


def mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Montgomery product, broadcasting (16,1) against (16,k)."""
    if a.shape != b.shape:
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
    return V.mont_mul(a, b)


def add(a: jax.Array, b: jax.Array) -> jax.Array:
    if a.shape != b.shape:
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
    return V.add_mod(a, b)


def sub(a: jax.Array, b: jax.Array) -> jax.Array:
    if a.shape != b.shape:
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
    return V.sub_mod(a, b)


def one_m(k: int = 1) -> jax.Array:
    """(16, k) Montgomery ones."""
    return jnp.broadcast_to(jnp.asarray(V.R_LIMBS)[:, None], (16, k))


def const_m(x: int, k: int = 1) -> jax.Array:
    return jnp.broadcast_to(
        jnp.asarray(V._const_limbs(F.to_mont(x)))[:, None], (16, k))


def powers(g_m: jax.Array, k: int) -> jax.Array:
    """[1, g, g^2, ..., g^(k-1)] as (16, k) Montgomery (log-doubling)."""
    if _cheap(g_m) and k <= 4096:
        g = F.from_mont(V.unpack_scalar(g_m))
        out, acc = [], 1
        for _ in range(k):
            out.append(acc)
            acc = acc * g % F.P
        return _pack_mont(out)
    return _powers_jit(g_m, k)


@functools.partial(jax.jit, static_argnums=(1,))
def _powers_jit(g_m: jax.Array, k: int) -> jax.Array:
    out = one_m(1)
    g_pow = g_m  # g^(2^s)
    while out.shape[1] < k:
        out = jnp.concatenate(
            [out, mul(out, jnp.broadcast_to(g_pow, (16, out.shape[1])))],
            axis=1)
        g_pow = V.mont_mul(g_pow, g_pow)
    return out[:, :k]


def univ_to_ml(z_m: jax.Array, m: int) -> jax.Array:
    """(16, p) Montgomery points -> (16, m, p) MSB-first multilinear coords.

    coords[k] = z^(2^(m-1-k)) (statement.univariate_to_multilinear_point).
    """
    if _cheap(z_m) and m * z_m.shape[1] <= 65536:
        zs = _host_monts(z_m)
        rows = [[0] * len(zs) for _ in range(m)]
        for j, z in enumerate(zs):
            acc = z
            for k in range(m - 1, -1, -1):
                rows[k][j] = acc
                acc = acc * acc % F.P
        flat = [v for row in rows for v in row]
        return _pack_mont(flat).reshape(16, m, len(zs))
    return _univ_to_ml_jit(z_m, m)


@functools.partial(jax.jit, static_argnums=(1,))
def _univ_to_ml_jit(z_m: jax.Array, m: int) -> jax.Array:
    rows = [None] * m
    acc = z_m
    for k in range(m - 1, -1, -1):
        rows[k] = acc
        acc = V.mont_mul(acc, acc)
    return jnp.stack(rows, axis=1)


def eval_cubic_m(coeffs, x_m: jax.Array) -> jax.Array:
    """Horner at x for (16,1)-shaped Montgomery cubic coefficients."""
    acc = coeffs[-1]
    for c in reversed(coeffs[:-1]):
        acc = add(mul(acc, x_m), c)
    return acc


def eq_table_dev(r_m: jax.Array, m: int) -> jax.Array:
    """eq(r, x) over the hypercube from device Montgomery coords (16, m).

    Same doubling order as ``ops.sumcheck.eq_table``: process coords in
    reverse so r[0] lands on the most-significant index bit.
    """
    if _cheap(r_m) and (1 << m) <= 65536:
        rs = _host_monts(r_m)
        e = [1]
        for r in reversed(rs):
            omr = (1 - r) % F.P
            e = [x * omr % F.P for x in e] + [x * r % F.P for x in e]
        return _pack_mont(e)
    return _eq_table_dev_jit(r_m, m)


@functools.partial(jax.jit, static_argnums=(1,))
def _eq_table_dev_jit(r_m: jax.Array, m: int) -> jax.Array:
    e = one_m(1)
    one = one_m(1)
    for k in range(m - 1, -1, -1):
        rk = r_m[:, k:k + 1]
        om = V.sub_mod(one, rk)
        n = e.shape[1]
        e = jnp.concatenate(
            [V.mont_mul(e, jnp.broadcast_to(om, (16, n))),
             V.mont_mul(e, jnp.broadcast_to(rk, (16, n)))], axis=1)
    return e


def pow_base(base: int, exps: jax.Array, log_bits: int) -> jax.Array:
    """base^exps as (16, q) Montgomery scalars, exps (q,) uint32 device.

    Square-and-multiply over the (static) bit width — log_bits tiny scalar
    muls instead of a 2^log_bits-entry power table."""
    if _cheap(exps) and exps.shape[0] <= 4096:
        import numpy as _np
        es = _np.asarray(jax.device_get(exps)).tolist()
        return _pack_mont([pow(base, int(e), F.P) for e in es])
    q = exps.shape[0]
    acc = one_m(q)
    for b in range(log_bits):
        c = const_m(pow(base, 1 << b, F.P), q)
        bit = ((exps >> b) & jnp.uint32(1)).astype(bool)
        acc = jnp.where(bit[None, :], mul(acc, c), acc)
    return acc


def scalar_index_u32(canon: jax.Array, mask: int) -> jax.Array:
    """Low bits of (16, q) canonical scalars as a (q,) uint32 vector.

    ``mask + 1`` must be a power of two <= 2^32 (s % 2^k == low bits)."""
    return (canon[0] | (canon[1] << 16)) & jnp.uint32(mask)


# ---------------------------------------------------------------------------
# device duplex sponge


@functools.partial(jax.jit, static_argnums=(2, 3))
def _absorb_jit(state: jax.Array, arr: jax.Array, k: int,
                start_pos: int) -> jax.Array:
    """Absorb k canonical units (columns of arr) with duplex semantics."""
    from ..ops.fused import _permute_state
    pos = start_pos
    for i in range(k):
        if pos == RATE:
            state = _permute_state(state)
            pos = 0
        state = jnp.concatenate([arr[:, i:i + 1], state[:, 1:]], axis=1)
        pos = 1
    return state


@functools.partial(jax.jit, static_argnums=(1,))
def _squeeze_jit(state: jax.Array, n: int):
    from ..ops.fused import _permute_state
    if n == 1:
        state = _permute_state(state)
        return state, state[:, :1]

    # fori_loop keeps ONE permute ladder in the graph instead of n copies:
    # the unrolled 18-round ladder dominates XLA:CPU compile time for the
    # multi-scalar squeezes (STIR queries squeeze up to ~100 at once).
    def body(i, carry):
        state, outs = carry
        state = _permute_state(state)
        outs = jax.lax.dynamic_update_slice(outs, state[:, :1], (0, i))
        return state, outs

    state, outs = jax.lax.fori_loop(
        0, n, body, (state, jnp.zeros((16, n), dtype=jnp.uint32)))
    return state, outs


# ---------------------------------------------------------------------------
# packing helpers for the single final fetch


def _flatten_u32(arr: jax.Array):
    """Any uint32/int32 array -> ((16, w) block, restore-metadata)."""
    flat = arr.astype(jnp.uint32).reshape(-1)
    pad = (-flat.shape[0]) % 16
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(16, -1), (arr.shape, arr.dtype.name, pad)


def _restore(block: np.ndarray, meta):
    shape, dtype, pad = meta
    flat = block.reshape(-1)
    if pad:
        flat = flat[:-pad]
    return flat.astype(dtype).reshape(shape)


class DeviceProverState:
    """Drop-in prover transcript with device-resident sponge and buffers.

    Scalars enter/leave as (16, k) canonical device arrays; nothing is
    fetched until ``narg_string()``.
    """

    def __init__(self, domsep: DomainSeparator):
        iv_int = int.from_bytes(domsep.iv(), "little") % F.P
        self.state = V.pack([0, iv_int]).reshape(16, 2)
        self.absorb_pos = 0
        self.checker = _OpChecker(domsep.ops)
        self._order: list = []  # ("A", chunk) | ("H", builder, [(block, meta)...]) | ("HB", bytes)

    # -- core ops ------------------------------------------------------------

    def add_scalars_dev(self, arr: jax.Array) -> None:
        """Absorb (16, k) CANONICAL device scalars."""
        k = arr.shape[1]
        self.checker.expect("A", k)
        self.state = _absorb_jit(self.state, arr, k, self.absorb_pos)
        self.absorb_pos = 1
        self._order.append(("A", arr))

    def add_scalars(self, values: list[int]) -> None:
        self.add_scalars_dev(V.pack([v % F.P for v in values]))

    def challenge_scalars_dev(self, n: int) -> jax.Array:
        """Squeeze n challenges as (16, n) canonical device scalars."""
        self.checker.expect("S", n)
        self.state, out = _squeeze_jit(self.state, n)
        self.absorb_pos = 0
        return out

    def add_pow_nonce_dev(self, arr: jax.Array) -> None:
        """Absorb a grinding nonce held as a (16, 1) canonical device
        scalar; the wire carries 8 big-endian bytes (spongefish-pow
        framing), the sponge one unit (the nonce value)."""
        self.checker.expect("A", 8)
        self.state = _absorb_jit(self.state, arr, 1, self.absorb_pos)
        self.absorb_pos = 1
        self._order.append(("P", arr))

    def hint_arrays(self, builder, arrays: list) -> None:
        """Deferred hint: ``builder(*numpy_arrays) -> bytes`` at finalize."""
        self.checker.expect("H", 0)
        self._order.append(("H", builder, [_flatten_u32(a) for a in arrays]))

    def hint_bytes(self, data: bytes) -> None:
        self.checker.expect("H", 0)
        self._order.append(("HB", data))

    def replay_fused(self, new_state: jax.Array, absorbed_chunks: list,
                     pattern: list) -> None:
        """Adopt the result of a fused segment that advanced the sponge
        on device.  ``pattern`` is the segment's op list [("A", k) | ("S", n)];
        ``absorbed_chunks`` are its absorbed (16, k) canonical arrays in
        order.  Segments must end right after a squeeze."""
        ai = 0
        for kind, cnt in pattern:
            self.checker.expect(kind, cnt)
            if kind == "A":
                self._order.append(("A", absorbed_chunks[ai]))
                ai += 1
        assert ai == len(absorbed_chunks)
        assert pattern[-1][0] == "S", "fused segments must end on a squeeze"
        self.state = new_state
        self.absorb_pos = 0

    # -- finalize ------------------------------------------------------------

    def narg_string(self) -> bytes:
        self.checker.finish()
        blocks = []
        for entry in self._order:
            if entry[0] in ("A", "P"):
                blocks.append(entry[1])
            elif entry[0] == "H":
                blocks.extend(b for b, _ in entry[2])
        widths = [b.shape[1] for b in blocks]
        if blocks:
            fetched = np.asarray(
                jax.device_get(jnp.concatenate(blocks, axis=1)))
        offs = np.cumsum([0] + widths)
        bi = 0

        def next_block():
            nonlocal bi
            out = fetched[:, offs[bi]:offs[bi + 1]]
            bi += 1
            return out

        narg = bytearray()
        for entry in self._order:
            if entry[0] == "A":
                narg += V.to_bytes_le_block(next_block(),
                                            check_canonical=True)
            elif entry[0] == "P":
                block = next_block()
                nonce = 0
                for l in range(16):
                    nonce |= int(block[l, 0]) << (16 * l)
                assert 0 <= nonce < 1 << 64, "pow nonce exceeds u64"
                narg += nonce.to_bytes(8, "big")
            elif entry[0] == "HB":
                narg += len(entry[1]).to_bytes(4, "little")
                narg += entry[1]
            else:
                _, builder, metas = entry
                args = [_restore(next_block(), meta) for _, meta in metas]
                data = builder(*args)
                narg += len(data).to_bytes(4, "little")
                narg += data
        return bytes(narg)
