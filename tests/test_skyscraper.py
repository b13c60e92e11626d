"""Skyscraper known-answer tests (Sage-derived vectors from
``skyscraper/core/src/reference.rs:130-218``) + batched-vs-scalar differential
tests (the reference's proptest pattern)."""

import random

from provekit_tpu.fields import bn254 as F
from provekit_tpu.fields import vector as V
from provekit_tpu.hash import skyscraper as S


def test_sbox_table():
    # reference.rs:126-133 (Table 3)
    assert S.sbox(0xCD) == 0xD3
    assert S.sbox(0x17) == 0x0E
    assert S.sbox(0x83) == 0x17
    assert S.sbox(0x14) == 0x28
    assert S.sbox(0x2B) == 0x46
    assert S.sbox(0x1E) == 0xBC


def test_ss_2():
    # reference.rs:105-122: two square-steps starting at round constant 2
    l = 11818428481613126259506041491792444971306025298632020312923851211664140080269
    r = 16089984100220651117533376273482359701319211672522891227502963383930673183481
    l, r = S._step(2, l, r)
    l, r = S._step(3, l, r)
    assert l == 2897520731550929941842826131888578795995028656093850302425034320680216166225
    assert r == 10274752619072178425540318899508997829349102488123199431506343228471746115261


def test_bb_6():
    # reference.rs:136-152
    l = 13251711941470795978907268022756015766767985221093713388330058285942871890923
    r = 1017722258958995329580328739423576514309327442471989504101393158056883989572
    l, r = S._step(6, l, r)
    l, r = S._step(7, l, r)
    assert l == 3193610555912363022088172260048956988022957239290210718020144819371540058981
    assert r == 17363210535454321713488811303876243393424286347736908007836172565366081010820


def test_permute_zero():
    l, r = S.permute(0, 0)
    assert l == 5793276905781313965269111743763131906666794041798623267477617572701829069290
    assert r == 12296274483727574983376829575121280934973829438414198530604912453551798647077


def test_permute_random():
    l = 50417215636675310123686652273432694184389644587803328798109154235492038730484 % F.P
    r = 14620920779025509970947930308416120371903474543120179490887326852503500806990
    el = 8412949970293910117511617126618515787729842528183672400383899220234743146062
    er = 11868175801025513844525564200589229804433722826344843184417708742749423276015
    # NOTE: the Sage vector's l input is >= p; reduce first (Fr::new wraps).
    got_l, got_r = S.permute(l, r)
    assert (got_l, got_r) == (el, er)


def test_batched_vs_scalar():
    rng = random.Random(7)
    n = 64
    ls = [rng.randrange(F.P) for _ in range(n)]
    rs = [rng.randrange(F.P) for _ in range(n)]
    ls[0], rs[0] = 0, 0
    lv, rv = V.pack(ls), V.pack(rs)
    out = V.unpack(S.compress_v(lv, rv))
    want = [S.compress(l, r) for l, r in zip(ls, rs)]
    assert out == want


def test_bar_v_vs_scalar():
    rng = random.Random(8)
    xs = [rng.randrange(F.P) for _ in range(62)] + [0, 1]
    got = V.unpack(S._bar_v(V.pack(xs)))
    assert got == [S.bar(x) for x in xs]
