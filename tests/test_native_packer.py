"""Native C++ packer: builds, matches the Python packer bit-for-bit."""

import numpy as np
import pytest

from ionic_mpnn_tpu import native
from ionic_mpnn_tpu.data import iter_batches, plan_capacities
from ionic_mpnn_tpu.data.columnar import ColumnarIonPairs, iter_batches_fast

needs_native = pytest.mark.skipif(
    not native.native_available(), reason="g++ unavailable"
)


@needs_native
def test_native_matches_python_packer(encoded_viscosity):
    records = encoded_viscosity["viscosity"][:100]
    plan = plan_capacities(records, batch_size=16)
    data = ColumnarIonPairs.from_records(records)

    py_batches = list(iter_batches(records, plan, shuffle=False))
    nat_batches = list(iter_batches_fast(data, plan, shuffle=False))
    assert len(py_batches) == len(nat_batches)
    for pb, nb in zip(py_batches, nat_batches):
        for side in ("cation", "anion"):
            p, n = getattr(pb, side), getattr(nb, side)
            np.testing.assert_array_equal(p.atom_ids, n.atom_ids)
            np.testing.assert_array_equal(p.bond_ids, n.bond_ids)
            np.testing.assert_array_equal(p.src, n.src)
            np.testing.assert_array_equal(p.dst, n.dst)
            np.testing.assert_array_equal(p.node_graph, n.node_graph)
            np.testing.assert_array_equal(p.node_local, n.node_local)
            np.testing.assert_array_equal(p.node_mask, n.node_mask)
            np.testing.assert_array_equal(p.edge_mask, n.edge_mask)
        np.testing.assert_array_equal(pb.temperature, nb.temperature)
        np.testing.assert_array_equal(pb.y, nb.y)
        np.testing.assert_array_equal(pb.sample_mask, nb.sample_mask)


@needs_native
def test_native_matches_python_parity_mode(encoded_viscosity):
    records = encoded_viscosity["viscosity"][:40]
    plan = plan_capacities(records, batch_size=8, duplicate_edges=True)
    data = ColumnarIonPairs.from_records(records)
    py = list(iter_batches(records, plan))
    nat = list(iter_batches_fast(data, plan))
    assert len(py) == len(nat)
    for pb, nb in zip(py, nat):
        np.testing.assert_array_equal(pb.cation.src, nb.cation.src)
        np.testing.assert_array_equal(pb.cation.bond_ids, nb.cation.bond_ids)


@needs_native
def test_native_shuffle_covers_all_records(encoded_viscosity):
    records = encoded_viscosity["viscosity"][:60]
    plan = plan_capacities(records, batch_size=8)
    data = ColumnarIonPairs.from_records(records)
    batches = list(iter_batches_fast(data, plan, shuffle=True, seed=3))
    total = sum(int(b.sample_mask.sum()) for b in batches)
    assert total == 60
    ys = np.sort(np.concatenate([b.y[b.sample_mask > 0] for b in batches]))
    np.testing.assert_allclose(ys, np.sort(data.y), rtol=1e-6)


@needs_native
def test_native_capacity_overflow_raises():
    with pytest.raises(ValueError):
        native.pack_graphs_native(
            np.arange(10, dtype=np.int32), np.array([0, 10], np.int64),
            np.zeros(0, np.int32), np.zeros((0, 2), np.int32), np.array([0, 0], np.int64),
            node_cap=4, edge_cap=4,
        )


@needs_native
def test_native_faster_than_python(encoded_viscosity):
    import time

    records = encoded_viscosity["viscosity"]
    plan = plan_capacities(records, batch_size=64)
    data = ColumnarIonPairs.from_records(records)

    t0 = time.perf_counter()
    for _ in iter_batches(records, plan):
        pass
    t_py = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in iter_batches_fast(data, plan):
        pass
    t_nat = time.perf_counter() - t0
    # generous bound; typical speedup is much larger
    assert t_nat < t_py
