"""Window-tiled edge layout + all-MXU one-hot message path.

The one-hot implementation (``message_impl="onehot"``) must be
numerically interchangeable with the gather reference implementation on
the same graphs — tiling only re-orders edge slots, and summation is
exact for these magnitudes in float32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ionic_mpnn_tpu.benchmarks import make_bench_dataset
from ionic_mpnn_tpu.config import viscosity_config
from ionic_mpnn_tpu.data import iter_batches, plan_capacities
from ionic_mpnn_tpu.data.packing import (
    GraphCapacityError,
    window_tile_batch,
    window_tile_edges,
)
from ionic_mpnn_tpu.models import ViscosityModel
from ionic_mpnn_tpu.ops.message import (
    bond_type_matrices,
    message_pass_aggregate,
    message_pass_aggregate_onehot,
)

BS = 48


@pytest.fixture(scope="module")
def data():
    records, vocab = make_bench_dataset(BS, seed=3)
    return records, vocab


@pytest.fixture(scope="module")
def plans(data):
    records, _ = data
    plan_s = plan_capacities(records, batch_size=BS)
    plan_w = plan_capacities(records, batch_size=BS, edge_layout="window")
    return plan_s, plan_w


def test_window_plan_shapes(plans):
    plan_s, plan_w = plans
    assert plan_w.edge_layout == "window"
    assert plan_w.node_cap % plan_w.window == 0
    assert plan_w.edge_tile > 0


def _sorted_plan_at_window_caps(plan_w):
    from ionic_mpnn_tpu.data.loader import BatchPlan

    return BatchPlan(
        batch_size=plan_w.batch_size, node_cap=plan_w.node_cap,
        edge_cap=plan_w.edge_cap, duplicate_edges=plan_w.duplicate_edges,
        with_temperature=plan_w.with_temperature, target_key=plan_w.target_key,
    )


def test_tiling_preserves_edges_and_sortedness(data, plans):
    records, _ = data
    _, plan_w = plans
    batch = next(iter_batches(records, _sorted_plan_at_window_caps(plan_w)))
    g = batch.cation
    tiled = window_tile_edges(g, plan_w.edge_tile, plan_w.window)
    assert tiled.edge_layout == "window"
    nw = g.node_capacity // plan_w.window
    assert tiled.src.shape[0] == nw * plan_w.edge_tile

    def real_set(gg):
        m = np.asarray(gg.edge_mask)
        return sorted(
            zip(np.asarray(gg.src)[m], np.asarray(gg.dst)[m], np.asarray(gg.bond_ids)[m])
        )

    assert real_set(tiled) == real_set(g)
    # still globally dst-sorted (valid input for every other impl)
    assert np.all(np.diff(np.asarray(tiled.dst)) >= 0)
    # every real edge sits in its dst's window tile
    m = np.asarray(tiled.edge_mask)
    slots = np.flatnonzero(m)
    w_slot = slots // plan_w.edge_tile
    w_dst = np.asarray(tiled.dst)[slots] // plan_w.window
    assert np.array_equal(w_slot, w_dst)


def test_tiling_overflow_raises(data, plans):
    records, _ = data
    _, plan_w = plans
    batch = next(iter_batches(records, _sorted_plan_at_window_caps(plan_w)))
    with pytest.raises(GraphCapacityError):
        window_tile_edges(batch.cation, tile=2, window=128)


def _tables(vocab, seed=0):
    rng = np.random.default_rng(seed)
    V = vocab.bond_vocab_size + 1
    table = jnp.asarray(rng.normal(size=(V, 8)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(8, 32, 32)) * 0.2).astype(np.float32))
    return bond_type_matrices(table, w)


def test_onehot_matches_gather(data, plans):
    records, vocab = data
    _, plan_w = plans
    batch = next(iter_batches(records, plan_w))
    g = batch.anion
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(size=(g.node_capacity, 32)).astype(np.float32))
    m_table = _tables(vocab)
    ref = message_pass_aggregate(
        h, jnp.asarray(g.bond_ids), jnp.asarray(g.src), jnp.asarray(g.dst),
        m_table, jnp.asarray(g.edge_mask),
    )
    out = message_pass_aggregate_onehot(
        h, jnp.asarray(g.bond_ids), jnp.asarray(g.src), jnp.asarray(g.dst),
        m_table, jnp.asarray(g.edge_mask), window=plan_w.window,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_onehot_gradients_match(data, plans):
    records, vocab = data
    _, plan_w = plans
    g = next(iter_batches(records, plan_w)).cation
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.normal(size=(g.node_capacity, 32)).astype(np.float32))
    m_table = _tables(vocab)
    cot = jnp.asarray(rng.normal(size=h.shape).astype(np.float32))
    args = (jnp.asarray(g.bond_ids), jnp.asarray(g.src), jnp.asarray(g.dst))
    mask = jnp.asarray(g.edge_mask)

    def loss(fn, h_, m_):
        kw = {"window": plan_w.window} if fn is message_pass_aggregate_onehot else {}
        return jnp.sum(fn(h_, *args, m_, mask, **kw) * cot)

    gh_ref, gm_ref = jax.grad(lambda h_, m_: loss(message_pass_aggregate, h_, m_),
                              argnums=(0, 1))(h, m_table)
    gh, gm = jax.grad(lambda h_, m_: loss(message_pass_aggregate_onehot, h_, m_),
                      argnums=(0, 1))(h, m_table)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gm_ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("parity_mode", [False, True])
def test_model_level_parity(data, plans, parity_mode):
    """Full ViscosityModel: onehot on the tiled batch == gather on sorted."""
    records, vocab = data
    plan_s, plan_w = plans
    batch_w = next(iter_batches(records, plan_w))
    # node layouts must match for a like-for-like check: build the sorted
    # batch at the window plan's node capacity
    batch_s = next(iter_batches(records, _sorted_plan_at_window_caps(plan_w)))

    cfg_g = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                             parity_mode=parity_mode)
    import dataclasses

    cfg_o = dataclasses.replace(cfg_g, message_impl="onehot")
    model_g, model_o = ViscosityModel(cfg_g), ViscosityModel(cfg_o)
    variables = model_g.init(jax.random.PRNGKey(0), batch_s)
    pred_g = model_g.apply(variables, batch_s, deterministic=True)["pred"]
    pred_o = model_o.apply(variables, batch_w, deterministic=True)["pred"]
    np.testing.assert_allclose(np.asarray(pred_o), np.asarray(pred_g),
                               rtol=2e-4, atol=2e-4)


def test_loader_emits_tiled_batches(data, plans):
    records, _ = data
    _, plan_w = plans
    for batch in iter_batches(records, plan_w, shuffle=True, seed=7):
        for side, g in (("cation", batch.cation), ("anion", batch.anion)):
            node_cap, _, tile, _ = plan_w.side_caps(side)
            assert g.edge_layout == "window"
            assert g.node_capacity == node_cap
            nw = g.node_capacity // plan_w.window
            assert g.src.shape[0] == nw * tile


def test_resolve_message_impl_auto():
    """'auto' resolves per backend: gather on CPU (conftest pins CPU),
    explicit impls pass through untouched."""
    from ionic_mpnn_tpu.config import edge_layout_for, resolve_message_impl

    assert resolve_message_impl("auto") == "gather"  # tests run on CPU
    for impl in ("gather", "typed", "symmetric", "onehot"):
        assert resolve_message_impl(impl) == impl
    assert edge_layout_for("onehot") == "window_aligned"
    assert edge_layout_for("gather") == "sorted"


def test_resolve_onehot_window_dim_aware():
    """Window auto-rule: 64 only for bf16 at the reference D=32; large-dim
    configs take 256 (battery 42 pt 2: D=64 w64→w256 = 11.06→6.48 ms,
    D=128 25.06→19.20 — window COUNT dominates per-window one-hot width,
    AXON 4d; w512 is flat). Explicit window always wins."""
    from ionic_mpnn_tpu.config import resolve_onehot_window

    assert resolve_onehot_window("bfloat16") == 64
    assert resolve_onehot_window("float32") == 128
    assert resolve_onehot_window("bfloat16", atom_dim=64) == 256
    assert resolve_onehot_window("bfloat16", atom_dim=128) == 256
    assert resolve_onehot_window("float32", atom_dim=64) == 256
    assert resolve_onehot_window("bfloat16", 32, atom_dim=128) == 32


# ---------------------------------------------------------------------------
# window_ALIGNED layout (no molecule straddles a window; onehot runs halo-free)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def plan_a(data):
    records, _ = data
    return plan_capacities(records, batch_size=BS, edge_layout="window_aligned")


def test_aligned_plan_and_loader_invariants(data, plan_a):
    records, _ = data
    assert plan_a.edge_layout == "window_aligned"
    assert plan_a.node_align == plan_a.window
    assert plan_a.node_cap % plan_a.window == 0
    assert plan_a.edge_tile > 0
    seen = 0
    for batch in iter_batches(records, plan_a, shuffle=True, seed=11):
        seen += int(np.asarray(batch.sample_mask).sum())
        for g in (batch.cation, batch.anion):
            assert g.edge_layout == "window_aligned"
            m = np.asarray(g.edge_mask)
            # no real edge crosses a window boundary
            assert np.array_equal(
                np.asarray(g.src)[m] // plan_a.window,
                np.asarray(g.dst)[m] // plan_a.window,
            )
            # no molecule straddles: every real node's window == its
            # molecule-start window
            nm = np.asarray(g.node_mask)
            starts = np.flatnonzero(nm) - np.asarray(g.node_local)[nm]
            assert np.array_equal(
                np.flatnonzero(nm) // plan_a.window, starts // plan_a.window
            )
    assert seen == len(records)  # early-close never drops records


def test_aligned_pack_rejects_oversized_molecule():
    from ionic_mpnn_tpu.data.packing import pack_graphs

    g = {"atom_ids": [0] * 40, "bond_ids": [], "edge_indices": [],
         "num_atoms": 40}
    with pytest.raises(GraphCapacityError, match="aligned window"):
        pack_graphs([g], node_cap=256, edge_cap=64, node_align=32)


def test_onehot_halo_free_matches_gather(data, plan_a):
    records, vocab = data
    batch = next(iter_batches(records, plan_a))
    g = batch.anion
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(size=(g.node_capacity, 32)).astype(np.float32))
    m_table = _tables(vocab)
    ref = message_pass_aggregate(
        h, jnp.asarray(g.bond_ids), jnp.asarray(g.src), jnp.asarray(g.dst),
        m_table, jnp.asarray(g.edge_mask),
    )
    out = message_pass_aggregate_onehot(
        h, jnp.asarray(g.bond_ids), jnp.asarray(g.src), jnp.asarray(g.dst),
        m_table, jnp.asarray(g.edge_mask), window=plan_a.window, halo=False,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # gradients through the halo-free path
    cot = jnp.asarray(rng.normal(size=h.shape).astype(np.float32))
    args = (jnp.asarray(g.bond_ids), jnp.asarray(g.src), jnp.asarray(g.dst))
    mask = jnp.asarray(g.edge_mask)
    gh_ref, gm_ref = jax.grad(
        lambda h_, m_: jnp.sum(message_pass_aggregate(h_, *args, m_, mask) * cot),
        argnums=(0, 1))(h, m_table)
    gh, gm = jax.grad(
        lambda h_, m_: jnp.sum(message_pass_aggregate_onehot(
            h_, *args, m_, mask, window=plan_a.window, halo=False) * cot),
        argnums=(0, 1))(h, m_table)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gm_ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("parity_mode", [False, True])
def test_model_level_parity_aligned(data, plan_a, parity_mode):
    """ViscosityModel: onehot on the ALIGNED batch == gather on sorted.

    Node layouts differ (alignment gaps), but predictions are per-graph —
    pooling is mask-safe — so outputs must agree.
    """
    records, vocab = data
    plan_s = plan_capacities(records, batch_size=BS,
                             duplicate_edges=parity_mode)
    plan_ap = plan_capacities(records, batch_size=BS,
                              edge_layout="window_aligned",
                              duplicate_edges=parity_mode)
    batch_s = next(iter_batches(records, plan_s))
    batch_a = next(iter_batches(records, plan_ap))
    # like-for-like only if the first batch holds every record on both plans
    assert int(np.asarray(batch_s.sample_mask).sum()) == \
           int(np.asarray(batch_a.sample_mask).sum()) == len(records)

    cfg_g = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                             parity_mode=parity_mode)
    cfg_o = cfg_g.replace(message_impl="onehot")
    model_g, model_o = ViscosityModel(cfg_g), ViscosityModel(cfg_o)
    variables = model_g.init(jax.random.PRNGKey(0), batch_s)
    pred_g = model_g.apply(variables, batch_s, deterministic=True)["pred"]
    pred_o = model_o.apply(variables, batch_a, deterministic=True)["pred"]
    np.testing.assert_allclose(np.asarray(pred_o), np.asarray(pred_g),
                               rtol=2e-4, atol=2e-4)


def test_native_packer_aligned_matches_python(data, plan_a):
    from ionic_mpnn_tpu import native
    from ionic_mpnn_tpu.data.columnar import ColumnarIonPairs, iter_batches_fast

    if not native.native_available():
        pytest.skip("native packer not built")
    records, _ = data
    cols = ColumnarIonPairs.from_records(records)
    fast = list(iter_batches_fast(cols, plan_a))
    slow = list(iter_batches(records, plan_a))
    assert len(fast) == len(slow)
    for bf, bs in zip(fast, slow):
        for gf, gs in zip((bf.cation, bf.anion), (bs.cation, bs.anion)):
            np.testing.assert_array_equal(gf.atom_ids, gs.atom_ids)
            np.testing.assert_array_equal(gf.node_graph, gs.node_graph)
            np.testing.assert_array_equal(gf.edge_mask, gs.edge_mask)
            np.testing.assert_array_equal(gf.src, gs.src)
            np.testing.assert_array_equal(gf.dst, gs.dst)
            np.testing.assert_array_equal(gf.bond_ids, gs.bond_ids)
            assert gf.edge_layout == gs.edge_layout == "window_aligned"


def test_melting_point_model_onehot_aligned_parity(data):
    """MeltingPointModel (bond_dim = atom_dim^2 = 1024, MLP head): onehot
    on aligned batches == gather on sorted — the other flagship config."""
    from ionic_mpnn_tpu.config import melting_point_config
    from ionic_mpnn_tpu.models import MeltingPointModel

    records, vocab = data
    recs = [dict(r, mp=r.get("log_eta", 0.0)) for r in records]
    plan_s = plan_capacities(recs, batch_size=BS, with_temperature=False,
                             target_key="mp")
    plan_a = plan_capacities(recs, batch_size=BS, with_temperature=False,
                             target_key="mp", edge_layout="window_aligned")
    batch_s = next(iter_batches(recs, plan_s))
    batch_a = next(iter_batches(recs, plan_a))
    assert int(np.asarray(batch_s.sample_mask).sum()) == \
           int(np.asarray(batch_a.sample_mask).sum()) == len(recs)

    cfg_g = melting_point_config(vocab.atom_vocab_size, vocab.bond_vocab_size)
    cfg_o = cfg_g.replace(message_impl="onehot")
    model_g, model_o = MeltingPointModel(cfg_g), MeltingPointModel(cfg_o)
    variables = model_g.init(jax.random.PRNGKey(0), batch_s)
    pred_g = model_g.apply(variables, batch_s, deterministic=True)["pred"]
    pred_o = model_o.apply(variables, batch_a, deterministic=True)["pred"]
    np.testing.assert_allclose(np.asarray(pred_o), np.asarray(pred_g),
                               rtol=2e-4, atol=2e-4)


def test_onehot_vloop_select_matches_lanes(data, plan_a):
    records, vocab = data
    g = next(iter_batches(records, plan_a)).cation
    rng = np.random.default_rng(4)
    h = jnp.asarray(rng.normal(size=(g.node_capacity, 32)).astype(np.float32))
    m_table = _tables(vocab)
    args = (jnp.asarray(g.bond_ids), jnp.asarray(g.src), jnp.asarray(g.dst),
            m_table, jnp.asarray(g.edge_mask))
    a = message_pass_aggregate_onehot(h, *args, window=plan_a.window,
                                      halo=False, select="lanes")
    b = message_pass_aggregate_onehot(h, *args, window=plan_a.window,
                                      halo=False, select="vloop")
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-5, atol=1e-5)


def test_onehot_basis_select_matches_lanes(data, plan_a):
    """select='basis' (contract over the F=8 embedding basis instead of V
    lanes — the large-D MFU fix, battery 42) must be value- AND grad-
    equal to lanes (same math, different association)."""
    records, vocab = data
    g = next(iter_batches(records, plan_a)).cation
    rng = np.random.default_rng(4)
    h = jnp.asarray(rng.normal(size=(g.node_capacity, 32)).astype(np.float32))
    V = vocab.bond_vocab_size + 1
    table = jnp.asarray(rng.normal(size=(V, 8)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(8, 32, 32)) * 0.2).astype(np.float32))
    m_table = bond_type_matrices(table, w)
    args = (jnp.asarray(g.bond_ids), jnp.asarray(g.src), jnp.asarray(g.dst),
            m_table, jnp.asarray(g.edge_mask))
    a = message_pass_aggregate_onehot(h, *args, window=plan_a.window,
                                      halo=False, select="lanes")
    b = message_pass_aggregate_onehot(h, *args, window=plan_a.window,
                                      halo=False, select="basis",
                                      bond_transform=w, bond_embed=table)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-4, atol=1e-4)

    def loss(hh, which, kw):
        out = message_pass_aggregate_onehot(
            hh, *args, window=plan_a.window, halo=False, select=which, **kw)
        return jnp.sum(out ** 2)

    ga = jax.grad(loss)(h, "lanes", {})
    gb = jax.grad(loss)(h, "basis",
                        {"bond_transform": w, "bond_embed": table})
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               rtol=1e-3, atol=1e-4)

    # missing basis operands raise loudly
    with np.testing.assert_raises(ValueError):
        message_pass_aggregate_onehot(h, *args, window=plan_a.window,
                                      halo=False, select="basis")


def test_model_basis_select_matches_lanes(data, plan_a):
    """Full model with onehot_select='basis' == 'lanes' predictions."""
    from ionic_mpnn_tpu.config import viscosity_config
    from ionic_mpnn_tpu.models import ViscosityModel

    records, vocab = data
    batch = next(iter_batches(records, plan_a))
    base = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                            message_impl="onehot",
                            onehot_window=plan_a.window)
    m_lanes = ViscosityModel(base.replace(onehot_select="lanes"))
    m_basis = ViscosityModel(base.replace(onehot_select="basis"))
    variables = m_lanes.init(jax.random.PRNGKey(0), batch)
    p1 = m_lanes.apply(variables, batch, deterministic=True)["pred"]
    p2 = m_basis.apply(variables, batch, deterministic=True)["pred"]
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                               rtol=2e-4, atol=2e-4)


def test_resolve_onehot_select_guard():
    """vloop auto-falls back to lanes above the compile-cost cap
    (measured: vloop program size/compile time grow linearly with the
    bond vocab — 0.5 s -> 9.8 s per grad-op from V=9 to V=257)."""
    from ionic_mpnn_tpu.ops.message import VLOOP_MAX_TYPES, resolve_onehot_select

    assert resolve_onehot_select("auto", 9) == "vloop"
    assert resolve_onehot_select("auto", VLOOP_MAX_TYPES) == "vloop"
    assert resolve_onehot_select("auto", VLOOP_MAX_TYPES + 1) == "lanes"
    assert resolve_onehot_select("auto", 257) == "lanes"
    # explicit choices always win
    assert resolve_onehot_select("vloop", 257) == "vloop"
    assert resolve_onehot_select("lanes", 9) == "lanes"


def test_large_vocab_onehot_builds_and_matches(data, plans):
    """A large-V model (above the vloop cap) builds without unrolled
    per-type matmuls and stays numerically exact vs the gather path."""
    records, vocab = data
    _, plan_w = plans
    g = next(iter_batches(records, plan_w)).cation
    V = 257  # > VLOOP_MAX_TYPES -> auto resolves to lanes
    rng = np.random.default_rng(4)
    h = jnp.asarray(rng.normal(size=(g.node_capacity, 32)).astype(np.float32))
    m_table = jnp.asarray(rng.normal(size=(V, 32, 32)).astype(np.float32) * 0.1)
    bond_ids = jnp.asarray(
        np.where(np.asarray(g.edge_mask),
                 np.asarray(g.bond_ids) % (V - 1) + 1, 0).astype(np.int32)
    )
    ref = message_pass_aggregate(
        h, bond_ids, jnp.asarray(g.src), jnp.asarray(g.dst), m_table,
        jnp.asarray(g.edge_mask),
    )
    out = message_pass_aggregate_onehot(
        h, bond_ids, jnp.asarray(g.src), jnp.asarray(g.dst), m_table,
        jnp.asarray(g.edge_mask), window=plan_w.window, select="auto",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
