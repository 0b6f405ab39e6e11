"""Device-resident grid packing (ops/grid_pack.py) vs the host packer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ionic_mpnn_tpu.data import encode_graph, smiles_to_graph
from ionic_mpnn_tpu.data.packing import pack_graphs
from ionic_mpnn_tpu.inference import IonPool
from ionic_mpnn_tpu.ops.grid_pack import (
    device_pool,
    grid_batch_on_device,
    pack_side_on_device,
)

IONS = [
    "C[N+](C)(C)C",
    "CCn1cc[n+](C)c1",
    "CC[n+]1ccccc1",
    "[Cl-]",
    "CC(=O)[O-]",
    "[B-](F)(F)(F)F",
]


def _real_edge_multiset(p):
    m = np.asarray(p.edge_mask, bool)
    return sorted(
        zip(
            np.asarray(p.src)[m].tolist(),
            np.asarray(p.dst)[m].tolist(),
            np.asarray(p.bond_ids)[m].tolist(),
        )
    )


@pytest.mark.parametrize("duplicate_edges", [False, True])
def test_device_pack_matches_host_pack(encoded_viscosity, duplicate_edges):
    vocab = encoded_viscosity["vocab"]
    pool = IonPool(IONS, vocab)
    assert not pool.skipped
    dpool = device_pool(pool, duplicate_edges=duplicate_edges)

    sel = np.array([2, 0, 5, 3, 2, 1, 4, 0], np.int32)
    node_cap, edge_cap = 128, 768 if duplicate_edges else 384
    dev = jax.jit(
        lambda s: pack_side_on_device(
            dpool, s, node_cap, edge_cap, duplicate_edges=duplicate_edges
        )
    )(jnp.asarray(sel))

    graphs = [encode_graph(smiles_to_graph(IONS[i]), vocab) for i in sel]
    host = pack_graphs(graphs, node_cap, edge_cap,
                       duplicate_edges=duplicate_edges)

    np.testing.assert_array_equal(dev.atom_ids, host.atom_ids)
    np.testing.assert_array_equal(dev.node_graph, host.node_graph)
    np.testing.assert_array_equal(dev.node_local, host.node_local)
    np.testing.assert_array_equal(dev.node_mask, host.node_mask)
    assert int(np.sum(dev.edge_mask)) == int(np.sum(host.edge_mask))
    # identical real-edge SEQUENCE: both paths are stable dst-sorts
    dm, hm = np.asarray(dev.edge_mask, bool), np.asarray(host.edge_mask, bool)
    np.testing.assert_array_equal(np.asarray(dev.src)[dm], np.asarray(host.src)[hm])
    np.testing.assert_array_equal(np.asarray(dev.dst)[dm], np.asarray(host.dst)[hm])
    np.testing.assert_array_equal(np.asarray(dev.bond_ids)[dm],
                                  np.asarray(host.bond_ids)[hm])
    assert dev.n_graphs == host.n_graphs == len(sel)
    # the FULL dst stream (pads included) upholds indices_are_sorted=True
    assert np.all(np.diff(np.asarray(dev.dst)) >= 0)


def test_device_pack_dup_flag_mismatch_raises(encoded_viscosity):
    vocab = encoded_viscosity["vocab"]
    dpool = device_pool(IonPool(IONS, vocab), duplicate_edges=False)
    with pytest.raises(ValueError, match="duplicate_edges"):
        pack_side_on_device(dpool, jnp.zeros(2, jnp.int32), 64, 128,
                            duplicate_edges=True)


def test_grid_batch_partial_tail(encoded_viscosity):
    vocab = encoded_viscosity["vocab"]
    cat = IonPool(IONS[:3], vocab)
    an = IonPool(IONS[3:], vocab)
    temps = np.array([300.0, 350.0], np.float32)
    C, A, T = 3, 3, 2
    total = C * A * T  # 18
    B = 8  # last batch holds 2 real candidates

    batch = jax.jit(
        lambda g0: grid_batch_on_device(
            device_pool(cat), device_pool(an), jnp.asarray(temps), g0,
            n_cations=C, n_anions=A, total=total, batch_size=B,
            node_cap=256, edge_cap=512,
        )
    )(jnp.int32(16))
    mask = np.asarray(batch.sample_mask)
    np.testing.assert_array_equal(mask, [1, 1, 0, 0, 0, 0, 0, 0])
    t = np.asarray(batch.temperature)[:, 0]
    # gids 16,17 -> ti = 1 -> 350 K; padded slots zeroed
    np.testing.assert_allclose(t[:2], [350.0, 350.0])
    np.testing.assert_allclose(t[2:], 0.0)


def _engine(encoded_viscosity, batch_size=8):
    from ionic_mpnn_tpu.config import viscosity_config
    from ionic_mpnn_tpu.data import iter_batches, plan_capacities
    from ionic_mpnn_tpu.data.loader import BatchPlan
    from ionic_mpnn_tpu.inference import ScreeningEngine
    from ionic_mpnn_tpu.models import ViscosityModel

    vocab = encoded_viscosity["vocab"]
    records = encoded_viscosity["viscosity"][:batch_size]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=2)
    model = ViscosityModel(cfg)
    plan = BatchPlan(batch_size=batch_size, node_cap=batch_size * 64,
                     edge_cap=batch_size * 192)
    init_plan = plan_capacities(records, batch_size=batch_size)
    params = model.init(jax.random.PRNGKey(0), next(iter_batches(records, init_plan)))
    return ScreeningEngine(model, params["params"], vocab, plan)


@pytest.mark.parametrize("steps_per_call", [1, 3])
def test_screen_grid_device_matches_bruteforce(encoded_viscosity, steps_per_call):
    engine = _engine(encoded_viscosity)
    cations = IONS[:3]
    anions = IONS[3:5]
    temps = [300.0, 350.0]
    report = engine.screen_grid(
        cations, anions, temps, top_k=5,
        device_pack=True, steps_per_call=steps_per_call,
    )
    assert report.n_screened == 12
    assert len(report.results) == 5
    assert report.producer_wait_s == 0.0

    # brute force through the generic per-candidate path (cation-fastest order)
    cands = [(cations[ci], anions[ai], temps[ti])
             for ti in range(2) for ai in range(2) for ci in range(3)]
    brute = []
    for i in range(0, len(cands), 8):
        brute.extend(engine.predict_batch(cands[i:i + 8]))
    brute = np.asarray(brute)
    order = np.argsort(brute)[:5]
    np.testing.assert_allclose(
        [r.prediction for r in report.results], brute[order],
        rtol=2e-5, atol=1e-6,
    )
    got_pairs = [(r.cation, r.anion) for r in report.results]
    assert got_pairs == [cands[i][:2] for i in order]


def test_screen_grid_device_matches_host_path(encoded_viscosity):
    from ionic_mpnn_tpu import native

    if not native.native_available():
        pytest.skip("native packer not built")
    engine = _engine(encoded_viscosity)
    cations, anions, temps = IONS[:3], IONS[3:], [290.0, 320.0, 360.0]
    dev = engine.screen_grid(cations, anions, temps, top_k=7,
                             device_pack=True, steps_per_call=2)
    host = engine.screen_grid(cations, anions, temps, top_k=7,
                              device_pack=False)
    assert [(r.cation, r.anion, r.temperature) for r in dev.results] == \
           [(r.cation, r.anion, r.temperature) for r in host.results]
    np.testing.assert_allclose(
        [r.prediction for r in dev.results],
        [r.prediction for r in host.results], rtol=2e-5, atol=1e-6,
    )


def test_window_tile_on_device_matches_host(encoded_viscosity):
    """Device window tiler == host window_tile_edges on the same molecules."""
    from ionic_mpnn_tpu.data.packing import window_tile_edges
    from ionic_mpnn_tpu.ops.grid_pack import (
        pool_window_tile_bound,
        window_tile_on_device,
    )

    vocab = encoded_viscosity["vocab"]
    pool = IonPool(IONS, vocab)
    dpool = device_pool(pool)
    sel = np.array([2, 0, 5, 3, 2, 1, 4, 0], np.int32)
    node_cap, edge_cap = 128, 384
    tile = pool_window_tile_bound(pool.a_len, pool.e_len, window=128)
    dev = jax.jit(
        lambda s: window_tile_on_device(
            pack_side_on_device(dpool, s, node_cap, edge_cap), tile, 128
        )
    )(jnp.asarray(sel))

    graphs = [encode_graph(smiles_to_graph(IONS[i]), vocab) for i in sel]
    host = window_tile_edges(
        pack_graphs(graphs, node_cap, edge_cap), tile, 128
    )
    assert dev.edge_layout == host.edge_layout == "window"
    np.testing.assert_array_equal(dev.edge_mask, host.edge_mask)
    m = np.asarray(host.edge_mask, bool)
    np.testing.assert_array_equal(np.asarray(dev.src)[m], np.asarray(host.src)[m])
    np.testing.assert_array_equal(np.asarray(dev.dst)[m], np.asarray(host.dst)[m])
    np.testing.assert_array_equal(np.asarray(dev.bond_ids)[m],
                                  np.asarray(host.bond_ids)[m])
    # pad slots stay locality-safe self-loops with bond 0
    np.testing.assert_array_equal(np.asarray(dev.src)[~m], np.asarray(dev.dst)[~m])
    assert np.all(np.asarray(dev.bond_ids)[~m] == 0)


def test_screen_grid_onehot_matches_gather(encoded_viscosity):
    """Full device sweep on the onehot/window path == the gather path."""
    from ionic_mpnn_tpu.inference import ScreeningEngine

    base = _engine(encoded_viscosity)
    cfg_oh = base.model.cfg.replace(message_impl="onehot")
    from ionic_mpnn_tpu.data.loader import BatchPlan
    from ionic_mpnn_tpu.models import ViscosityModel

    plan_oh = BatchPlan(
        batch_size=base.plan.batch_size,
        node_cap=base.plan.node_cap,
        edge_cap=base.plan.edge_cap,
        edge_layout="window",
    )
    eng_oh = ScreeningEngine(ViscosityModel(cfg_oh), base._variables["params"],
                             base.vocab, plan_oh)
    cations, anions, temps = IONS[:3], IONS[3:], [290.0, 320.0, 360.0]
    ref = base.screen_grid(cations, anions, temps, top_k=7,
                           device_pack=True, steps_per_call=2)
    oh = eng_oh.screen_grid(cations, anions, temps, top_k=7,
                            device_pack=True, steps_per_call=2)
    assert [(r.cation, r.anion, r.temperature) for r in oh.results] == \
           [(r.cation, r.anion, r.temperature) for r in ref.results]
    np.testing.assert_allclose(
        [r.prediction for r in oh.results],
        [r.prediction for r in ref.results], rtol=2e-5, atol=1e-6,
    )
    # streaming predict_batch path tiles on host (conservative tile) —
    # same numbers again
    cands = [(cations[0], anions[0], 300.0), (cations[2], anions[1], 340.0)]
    np.testing.assert_allclose(
        eng_oh.predict_batch(cands), base.predict_batch(cands),
        rtol=2e-5, atol=1e-6,
    )


def test_screen_grid_factorized_matches_bruteforce(encoded_viscosity):
    """Factorized sweep (per-ion encode + VFT closed form) == full model."""
    engine = _engine(encoded_viscosity)
    cations, anions, temps = IONS[:3], IONS[3:], [290.0, 320.0, 360.0]
    brute = engine.screen_grid(cations, anions, temps, top_k=9,
                               device_pack=True, steps_per_call=2)
    fact = engine.screen_grid_factorized(cations, anions, temps, top_k=9)
    assert fact.n_screened == brute.n_screened == 27
    assert [(r.cation, r.anion, r.temperature) for r in fact.results] == \
           [(r.cation, r.anion, r.temperature) for r in brute.results]
    np.testing.assert_allclose(
        [r.prediction for r in fact.results],
        [r.prediction for r in brute.results], rtol=2e-5, atol=1e-6,
    )


def test_screen_grid_factorized_mlp_head_matches_bruteforce(encoded_viscosity):
    """T-free factorized sweep (melting-point MLP head) == full model."""
    import dataclasses

    from ionic_mpnn_tpu.config import melting_point_config
    from ionic_mpnn_tpu.data import iter_batches, plan_capacities
    from ionic_mpnn_tpu.data.loader import BatchPlan
    from ionic_mpnn_tpu.inference import ScreeningEngine
    from ionic_mpnn_tpu.models import MeltingPointModel

    vocab = encoded_viscosity["vocab"]
    records = [dict(r, mp=r.get("log_eta", 0.0))
               for r in encoded_viscosity["viscosity"][:8]]
    cfg = melting_point_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                               num_steps=2)
    model = MeltingPointModel(cfg)
    init_plan = plan_capacities(records, batch_size=8, with_temperature=False,
                                target_key="mp")
    params = model.init(jax.random.PRNGKey(0),
                        next(iter_batches(records, init_plan)))
    plan = BatchPlan(batch_size=8, node_cap=512, edge_cap=1536,
                     with_temperature=False, target_key="mp")
    eng = ScreeningEngine(model, params["params"], vocab, plan)
    cations, anions = IONS[:3], IONS[3:]
    brute = eng.screen_grid(cations, anions, [0.0], top_k=6,
                            device_pack=True, steps_per_call=2)
    fact = eng.screen_grid_factorized(cations, anions, top_k=6)
    assert fact.n_screened == brute.n_screened == 9
    assert [(r.cation, r.anion) for r in fact.results] == \
           [(r.cation, r.anion) for r in brute.results]
    np.testing.assert_allclose(
        [r.prediction for r in fact.results],
        [r.prediction for r in brute.results], rtol=2e-5, atol=1e-6,
    )
    # blocked pair eval (CB < C) stays identical
    blk = eng.screen_grid_factorized(cations, anions, top_k=6, block_elems=3)
    np.testing.assert_allclose(
        [r.prediction for r in blk.results],
        [r.prediction for r in fact.results], rtol=1e-6, atol=1e-7,
    )


def test_screen_grid_factorized_blocked_matches_single(encoded_viscosity):
    """Cation-blocked eval (HBM-safe path for 1B+ grids) == single block."""
    engine = _engine(encoded_viscosity)
    cations, anions, temps = IONS[:3], IONS[3:], [290.0, 320.0, 360.0]
    one = engine.screen_grid_factorized(cations, anions, temps, top_k=9)
    blk = engine.screen_grid_factorized(cations, anions, temps, top_k=9,
                                        block_elems=7)  # forces CB=1
    assert [(r.cation, r.anion, r.temperature) for r in blk.results] == \
           [(r.cation, r.anion, r.temperature) for r in one.results]
    np.testing.assert_allclose(
        [r.prediction for r in blk.results],
        [r.prediction for r in one.results], rtol=1e-6, atol=1e-7,
    )


def test_window_tile_on_device_eager_overflow_raises(encoded_viscosity):
    from ionic_mpnn_tpu.ops.grid_pack import window_tile_on_device

    vocab = encoded_viscosity["vocab"]
    dpool = device_pool(IonPool(IONS, vocab))
    packed = pack_side_on_device(dpool, jnp.asarray(np.zeros(8, np.int32)),
                                 128, 384)
    with pytest.raises(ValueError, match="tile capacity"):
        window_tile_on_device(packed, tile=2, window=128)


def test_factorized_two_stage_topk_matches_numpy_oracle(encoded_viscosity):
    """Grid big enough to trigger the chunked exact top-k (>=262k scores):
    results must equal a numpy replication of the closed form."""
    engine = _engine(encoded_viscosity)
    temps = np.linspace(280.0, 400.0, 30001).astype(np.float32)
    cations, anions = IONS[:3], IONS[3:]
    fact = engine.screen_grid_factorized(cations, anions, temps, top_k=7)
    assert fact.n_screened == 3 * 3 * 30001

    cat_pool = IonPool(cations, engine.vocab)
    an_pool = IonPool(anions, engine.vocab)
    pc = engine._project_pool(cat_pool, "cation")
    pa = engine._project_pool(an_pool, "anion")
    head = engine._variables["params"]["vft_head"]["visc_params"]
    k = np.asarray(head["kernel"], np.float32)
    b = np.asarray(head["bias"], np.float32)
    uc, ua = pc @ k, pa @ k + b
    raw = (uc[:, None, :] + ua[None, :, :]).astype(np.float32)
    sp = lambda x: np.logaddexp(0.0, x.astype(np.float64)).astype(np.float32)
    A_ = raw[..., 0]
    B_ = np.clip(sp(raw[..., 1]), 0.0, 20.0)
    C_ = np.clip(sp(raw[..., 2]), 0.1, 50.0)
    pred = A_[..., None] + B_[..., None] / (temps / 100.0 + C_[..., None] + 1e-6)
    best = np.sort(pred.reshape(-1))[:7]
    np.testing.assert_allclose([r.prediction for r in fact.results], best,
                               rtol=1e-4, atol=1e-5)


def test_screen_grid_aligned_matches_gather(encoded_viscosity):
    """Device sweep on the ALIGNED (halo-free, pitch-placed) layout == the
    gather-path sweep — VERDICT r2 weak #6: brute sweeps no longer
    normalize aligned down to the halo layout."""
    from ionic_mpnn_tpu.data.loader import BatchPlan
    from ionic_mpnn_tpu.inference import ScreeningEngine
    from ionic_mpnn_tpu.models import ViscosityModel

    base = _engine(encoded_viscosity)
    cfg_oh = base.model.cfg.replace(message_impl="onehot")
    plan_al = BatchPlan(
        batch_size=base.plan.batch_size,
        node_cap=base.plan.node_cap,
        edge_cap=base.plan.edge_cap,
        edge_layout="window_aligned",
    )
    eng = ScreeningEngine(ViscosityModel(cfg_oh), base._variables["params"],
                          base.vocab, plan_al)
    cations, anions, temps = IONS[:3], IONS[3:], [290.0, 320.0, 360.0]
    ref = base.screen_grid(cations, anions, temps, top_k=7,
                           device_pack=True, steps_per_call=2)
    al = eng.screen_grid(cations, anions, temps, top_k=7,
                         device_pack=True, steps_per_call=2)
    assert [(r.cation, r.anion, r.temperature) for r in al.results] == \
           [(r.cation, r.anion, r.temperature) for r in ref.results]
    np.testing.assert_allclose(
        [r.prediction for r in al.results],
        [r.prediction for r in ref.results], rtol=2e-5, atol=1e-6,
    )


def test_pitch_pack_is_aligned_and_matches_dense_semantics(encoded_viscosity):
    """Fixed-pitch device packing: same molecules/edges as dense packing,
    no molecule straddles a window, batch tagged window_aligned."""
    import jax.numpy as jnp

    from ionic_mpnn_tpu.inference import IonPool
    from ionic_mpnn_tpu.ops.grid_pack import (
        device_pool,
        pack_side_on_device,
        pool_aligned_tile_bound,
        pool_pitch,
        window_tile_on_device,
    )

    vocab = encoded_viscosity["vocab"]
    pool = IonPool(IONS, vocab)
    dpool = device_pool(pool)
    sel = jnp.asarray(np.array([0, 3, 1, 4, 2, 0, 5 % len(pool), 1], np.int32))
    B = int(sel.shape[0])
    pitch = pool_pitch(pool.a_len)
    aligned = pack_side_on_device(dpool, sel, B * pitch, 512, pitch=pitch)
    dense = pack_side_on_device(dpool, sel, 512, 512)

    # same multiset of (graph, local_src, local_dst, bond) real edges
    def edge_set(g):
        m = np.asarray(g.edge_mask)
        ng = np.asarray(g.node_graph)
        return sorted(
            (int(ng[s]), int(nl_s), int(nl_d), int(b))
            for s, d, b, nl_s, nl_d in zip(
                np.asarray(g.src)[m], np.asarray(g.dst)[m],
                np.asarray(g.bond_ids)[m],
                np.asarray(g.node_local)[np.asarray(g.src)[m]],
                np.asarray(g.node_local)[np.asarray(g.dst)[m]],
            )
        )

    assert edge_set(aligned) == edge_set(dense)
    # per-graph atom id multisets agree
    for gi in range(B):
        a_al = sorted(np.asarray(aligned.atom_ids)[
            (np.asarray(aligned.node_graph) == gi) & np.asarray(aligned.node_mask)])
        a_de = sorted(np.asarray(dense.atom_ids)[
            (np.asarray(dense.node_graph) == gi) & np.asarray(dense.node_mask)])
        assert a_al == a_de, gi
    # no straddling: every edge's src and dst share a 128-window
    m = np.asarray(aligned.edge_mask)
    assert np.array_equal(np.asarray(aligned.src)[m] // 128,
                          np.asarray(aligned.dst)[m] // 128)
    tile = pool_aligned_tile_bound(pool.e_len, 128, pitch)
    tiled = window_tile_on_device(aligned, tile, 128, aligned=True)
    assert tiled.edge_layout == "window_aligned"
    m2 = np.asarray(tiled.edge_mask)
    assert np.array_equal(np.asarray(tiled.src)[m2] // 128,
                          np.asarray(tiled.dst)[m2] // 128)


def test_grid_batch_per_side_caps_match_shared(encoded_viscosity):
    """Per-side anion caps (smaller node/edge planes + own pitch) carry the
    identical anion content as the shared-cap pack — round-3 screening
    per-side capacities (same argument as the train step's battery-27 win)."""
    vocab = encoded_viscosity["vocab"]
    cat = IonPool(IONS[:3], vocab)
    an = IonPool(IONS[3:], vocab)
    cat_d, an_d = device_pool(cat), device_pool(an)
    temps = jnp.asarray(np.array([300.0], np.float32))
    kw = dict(n_cations=3, n_anions=3, total=9, batch_size=8)

    shared = jax.jit(lambda g0: grid_batch_on_device(
        cat_d, an_d, temps, g0, node_cap=256, edge_cap=512, **kw,
    ))(jnp.int32(0))
    per_side = jax.jit(lambda g0: grid_batch_on_device(
        cat_d, an_d, temps, g0, node_cap=256, edge_cap=512,
        anion_node_cap=128, anion_edge_cap=256, **kw,
    ))(jnp.int32(0))

    # the anion plane actually shrinks...
    assert per_side.anion.atom_ids.shape[0] == 128
    assert per_side.anion.src.shape[0] == 256
    assert per_side.cation.atom_ids.shape == shared.cation.atom_ids.shape
    # ...and carries identical real content (masked equality)
    for field in ("atom_ids", "node_graph", "node_local"):
        nm_s = np.asarray(shared.anion.node_mask, bool)
        nm_p = np.asarray(per_side.anion.node_mask, bool)
        np.testing.assert_array_equal(
            np.asarray(getattr(shared.anion, field))[nm_s],
            np.asarray(getattr(per_side.anion, field))[nm_p], err_msg=field)
    em_s = np.asarray(shared.anion.edge_mask, bool)
    em_p = np.asarray(per_side.anion.edge_mask, bool)
    for field in ("src", "dst", "bond_ids"):
        np.testing.assert_array_equal(
            np.asarray(getattr(shared.anion, field))[em_s],
            np.asarray(getattr(per_side.anion, field))[em_p], err_msg=field)


def test_grid_batch_per_side_aligned_pitch(encoded_viscosity):
    """Aligned layout with a PER-SIDE pitch: the anion side runs at its own
    (smaller) pitch and window tiles, still halo-free and content-equal."""
    from ionic_mpnn_tpu.ops.grid_pack import (
        pool_aligned_tile_bound,
        pool_pitch,
    )

    vocab = encoded_viscosity["vocab"]
    cat = IonPool(IONS[:3], vocab)
    an = IonPool(IONS[3:], vocab)
    cat_d, an_d = device_pool(cat), device_pool(an)
    temps = jnp.asarray(np.array([300.0], np.float32))
    window, B = 32, 8
    p_c = pool_pitch(cat.a_len, window)
    p_a = pool_pitch(an.a_len, window)
    assert p_a < p_c  # the premise: anions are smaller
    t_c = pool_aligned_tile_bound(cat.e_len, window, p_c)
    t_a = pool_aligned_tile_bound(an.e_len, window, p_a)
    kw = dict(n_cations=3, n_anions=3, total=9, batch_size=B,
              edge_layout="window_aligned", window=window)

    batch = jax.jit(lambda g0: grid_batch_on_device(
        cat_d, an_d, temps, g0,
        node_cap=B * p_c, edge_cap=512, edge_tile=t_c, pitch=p_c,
        anion_node_cap=B * p_a, anion_edge_cap=256,
        anion_edge_tile=t_a, anion_pitch=p_a, **kw,
    ))(jnp.int32(0))
    assert batch.anion.atom_ids.shape[0] == B * p_a < B * p_c
    assert batch.anion.edge_layout == "window_aligned"
    # halo-free on BOTH sides at their own pitch: src/dst share a window
    for side in (batch.cation, batch.anion):
        m = np.asarray(side.edge_mask, bool)
        assert np.array_equal(np.asarray(side.src)[m] // window,
                              np.asarray(side.dst)[m] // window)
    # anion content matches a shared-pitch pack of the same selection
    shared = jax.jit(lambda g0: grid_batch_on_device(
        cat_d, an_d, temps, g0,
        node_cap=B * p_c, edge_cap=512, edge_tile=t_c, pitch=p_c, **kw,
    ))(jnp.int32(0))
    nm_s = np.asarray(shared.anion.node_mask, bool)
    nm_p = np.asarray(batch.anion.node_mask, bool)
    np.testing.assert_array_equal(
        np.asarray(shared.anion.atom_ids)[nm_s],
        np.asarray(batch.anion.atom_ids)[nm_p])
    em_s = np.asarray(shared.anion.edge_mask, bool)
    em_p = np.asarray(batch.anion.edge_mask, bool)
    # same per-(graph, local) edge multiset on the anion side
    def rel(g, m):
        ng = np.asarray(g.node_graph)
        nl = np.asarray(g.node_local)
        s, d = np.asarray(g.src)[m], np.asarray(g.dst)[m]
        return sorted(zip(ng[d].tolist(), nl[s].tolist(), nl[d].tolist(),
                          np.asarray(g.bond_ids)[m].tolist()))
    assert rel(shared.anion, em_s) == rel(batch.anion, em_p)


@pytest.mark.parametrize("layout", ["sorted", "window", "window_aligned"])
def test_screen_grid_per_side_matches_shared(encoded_viscosity, layout):
    """per_side_caps=True (default) == per_side_caps=False on every device
    layout — capacities change, math doesn't."""
    from ionic_mpnn_tpu.data.loader import BatchPlan
    from ionic_mpnn_tpu.inference import ScreeningEngine
    from ionic_mpnn_tpu.models import ViscosityModel

    base = _engine(encoded_viscosity)
    if layout == "sorted":
        eng = base
    else:
        cfg_oh = base.model.cfg.replace(message_impl="onehot")
        plan = BatchPlan(batch_size=base.plan.batch_size,
                         node_cap=base.plan.node_cap,
                         edge_cap=base.plan.edge_cap, edge_layout=layout)
        eng = ScreeningEngine(ViscosityModel(cfg_oh),
                              base._variables["params"], base.vocab, plan)
    cations, anions, temps = IONS[:3], IONS[3:], [290.0, 360.0]
    ps = eng.screen_grid(cations, anions, temps, top_k=7,
                         device_pack=True, steps_per_call=2)
    sh = eng.screen_grid(cations, anions, temps, top_k=7,
                         device_pack=True, steps_per_call=2,
                         per_side_caps=False)
    assert [(r.cation, r.anion, r.temperature) for r in ps.results] == \
           [(r.cation, r.anion, r.temperature) for r in sh.results]
    np.testing.assert_allclose(
        [r.prediction for r in ps.results],
        [r.prediction for r in sh.results], rtol=2e-5, atol=1e-6,
    )


def test_pack_side_padded_matches_elementwise(encoded_viscosity):
    """Molecule-major padded pack == element-gather pitch pack +
    window_tile_on_device on masked content (battery-30 fast path)."""
    from ionic_mpnn_tpu.ops.grid_pack import (
        pack_side_padded,
        padded_aligned_tile,
        pool_pitch,
    )

    vocab = encoded_viscosity["vocab"]
    pool = IonPool(IONS, vocab)
    window = 32
    for dup in (False, True):
        dpool = device_pool(pool, duplicate_edges=dup,
                            pitch=pool_pitch(pool.a_len, window))
        sel = jnp.asarray(np.array([0, 3, 1, 4, 2, 0, 5, 1], np.int32))
        B = int(sel.shape[0])
        fast = jax.jit(lambda s: pack_side_padded(dpool, s, window))(sel)
        assert fast.edge_layout == "window_aligned"
        assert fast.node_sorted
        assert fast.atom_ids.shape[0] == B * dpool.pitch
        assert fast.src.shape[0] == B * dpool.em

        ref_pool = device_pool(pool, duplicate_edges=dup)
        from ionic_mpnn_tpu.ops.grid_pack import (
            pool_aligned_tile_bound,
            window_tile_on_device,
        )
        tile = pool_aligned_tile_bound(ref_pool.e_len, window, dpool.pitch)
        slow = jax.jit(lambda s: window_tile_on_device(
            pack_side_on_device(ref_pool, s, B * dpool.pitch, 512,
                                duplicate_edges=dup, pitch=dpool.pitch),
            tile, window, aligned=True))(sel)

        # node planes identical (same pitch placement)
        np.testing.assert_array_equal(fast.atom_ids, slow.atom_ids)
        np.testing.assert_array_equal(fast.node_mask, slow.node_mask)
        np.testing.assert_array_equal(fast.node_local, slow.node_local)
        # masked rows of node_graph agree (gap rows differ only in the
        # forward-fill value — both non-decreasing, both masked)
        nm = np.asarray(fast.node_mask, bool)
        np.testing.assert_array_equal(np.asarray(fast.node_graph)[nm],
                                      np.asarray(slow.node_graph)[nm])
        assert np.all(np.diff(np.asarray(fast.node_graph)) >= 0)
        # same real-edge multiset (tile-internal order is free for onehot)
        def eset(g):
            m = np.asarray(g.edge_mask, bool)
            return sorted(zip(np.asarray(g.src)[m].tolist(),
                              np.asarray(g.dst)[m].tolist(),
                              np.asarray(g.bond_ids)[m].tolist()))
        assert eset(fast) == eset(slow)
        # window locality: every edge (pads included) stays in one window
        assert np.array_equal(np.asarray(fast.src) // window,
                              np.asarray(fast.dst) // window)
        # per-window edge positions match the implicit tile contract
        tile_f = padded_aligned_tile(window, dpool.pitch, dpool.em)
        assert fast.src.shape[0] == (B * dpool.pitch // window) * tile_f
