"""High-throughput screening inference: SMILES pairs → property predictions.

The reference has no serving/inference layer at all (inference happens
inline in its notebook by re-loading ``.keras`` files — SURVEY §1); this
module is the production path for the screening config (BASELINE.json
config 5: multi-million-pair ionic-liquid sweeps):

  * molecule featurization is cached per unique SMILES (screening sweeps
    are cation×anion grids — each ion repeats millions of times); grid
    sweeps additionally pre-encode each unique ion ONCE into columnar
    pools (:class:`IonPool`) so per-batch assembly is pure vectorized
    numpy + the C++ packer — no per-molecule Python loop,
  * batches are packed to one static shape and streamed through a single
    jitted forward,
  * optional data-parallel fan-out over a device mesh (``mesh=`` arg:
    stacked per-device batches, ``shard_map`` forward),
  * top-k selection runs ON DEVICE per batch (``lax.top_k``) and a tiny
    host-side heap merges k·n_batches survivors — the host never holds
    (or even materializes Python objects for) the full sweep,
  * host packing overlaps device compute via a pack-ahead producer
    thread (the ctypes packer call releases the GIL).
"""

from __future__ import annotations

import heapq
import queue
import threading
from dataclasses import dataclass
from typing import Any, Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import native
from .data import Vocab, encode_graph, smiles_to_graph
from .data.loader import BatchPlan
from .data.packing import IonPairBatch, PackedGraphs, pack_ion_pair_batch

__all__ = ["ScreeningEngine", "ScreenResult", "IonPool", "SweepReport"]


class IonPool:
    """Unique ions encoded once into flat columnar pools with a fully
    vectorized multi-molecule gather (no Python loop per molecule).

    Invalid/out-of-vocab SMILES are dropped with an audit list
    (``skipped``) — same no-silent-failure policy as the data tier.
    """

    def __init__(self, smiles: Sequence[str], vocab: Vocab):
        self.smiles: List[str] = []
        self.skipped: List[Tuple[str, str]] = []
        atoms, bonds, edges = [], [], []
        a_start, a_len, e_start, e_len = [], [], [], []
        na = ne = 0
        for s in smiles:
            try:
                g = encode_graph(smiles_to_graph(s), vocab)
            except (ValueError, KeyError) as e:
                self.skipped.append((s, str(e)))
                continue
            self.smiles.append(s)
            atoms.append(np.asarray(g["atom_ids"], np.int32))
            bonds.append(np.asarray(g["bond_ids"], np.int32))
            edges.append(np.asarray(g["edge_indices"], np.int32).reshape(-1, 2))
            a_start.append(na); a_len.append(len(atoms[-1]))
            e_start.append(ne); e_len.append(len(bonds[-1]))
            na += a_len[-1]; ne += e_len[-1]
        self.atoms = np.concatenate(atoms) if atoms else np.zeros(0, np.int32)
        self.bonds = np.concatenate(bonds) if bonds else np.zeros(0, np.int32)
        self.edges = (np.concatenate(edges) if edges
                      else np.zeros((0, 2), np.int32))
        self.a_start = np.asarray(a_start, np.int64)
        self.a_len = np.asarray(a_len, np.int64)
        self.e_start = np.asarray(e_start, np.int64)
        self.e_len = np.asarray(e_len, np.int64)

    def __len__(self) -> int:
        return len(self.smiles)

    @staticmethod
    def _multi_slice(pool: np.ndarray, starts, lens):
        """Vectorized concatenation of ``pool[starts[i]:starts[i]+lens[i]]``."""
        total = int(lens.sum())
        off = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=off[1:])
        flat = (np.arange(total, dtype=np.int64)
                - np.repeat(off[:-1], lens) + np.repeat(starts, lens))
        return pool[flat], off

    def gather(self, idx: np.ndarray):
        """Columnar arrays for molecules ``idx`` (packer-ready)."""
        idx = np.asarray(idx, np.int64)
        atoms, a_off = self._multi_slice(self.atoms, self.a_start[idx], self.a_len[idx])
        bonds, e_off = self._multi_slice(self.bonds, self.e_start[idx], self.e_len[idx])
        edges, _ = self._multi_slice(self.edges, self.e_start[idx], self.e_len[idx])
        return atoms, a_off, bonds, edges, e_off

    def sizes(self, idx: np.ndarray):
        return self.a_len[idx], self.e_len[idx]


@dataclass
class ScreenResult:
    cation: str
    anion: str
    temperature: float
    prediction: float

    def __lt__(self, other):  # heapq ordering
        return self.prediction < other.prediction


@dataclass
class SweepReport:
    """Outcome of a :meth:`ScreeningEngine.screen_grid` sweep."""

    results: List["ScreenResult"]
    n_screened: int
    pairs_per_s: float
    wall_s: float
    skipped: List[Tuple[str, str]]
    producer_wait_s: float = 0.0  # consumer time blocked on host packing
    device_s: float = 0.0  # dispatch + device forward + top-k transfer
    # pairs/s measured AFTER the first dispatch completes — excludes jit
    # compile (~minutes cold through the remote-compile tunnel) and the
    # pool upload; 0.0 when the sweep fit in a single dispatch
    steady_pairs_per_s: float = 0.0


class ScreeningEngine:
    """Batched screening over (cation_smiles, anion_smiles, T) candidates.

    With ``mesh`` (a ``jax.sharding.Mesh`` with a ``data`` axis), forwards
    fan out data-parallel: ``predict_batch`` accepts up to
    ``n_dev · batch_size`` candidates, packs one sub-batch per device, and
    runs a ``shard_map`` forward whose output concatenates over the axis.
    """

    def __init__(
        self,
        model,
        params: Any,
        vocab: Vocab,
        plan: BatchPlan,
        batch_stats: Any = None,
        normalizer=None,
        mesh: Any = None,
    ):
        self.model = model
        self.vocab = vocab
        self._aligned_requested = plan.edge_layout == "window_aligned"
        if self._aligned_requested:
            # HOST-packed batches (screen_pairs / host grid fallback)
            # normalize to the halo "window" layout: a fixed-B candidate
            # batch can overflow node capacity under greedy node_align
            # gaps (the training loader closes batches early instead —
            # not an option here), and the aligned plan's edge_tile lacks
            # the straddler headroom halo tiling needs. DEVICE grid
            # sweeps re-derive the aligned layout with closed-form
            # fixed-PITCH placement (ops/grid_pack.py::pool_pitch) in
            # screen_grid, so the production brute path runs halo-free.
            import dataclasses

            plan = dataclasses.replace(plan, edge_layout="window",
                                       edge_tile=0, anion_edge_tile=0,
                                       anion_pitch=0)
        self.plan = plan
        self.normalizer = normalizer
        self.mesh = mesh
        self._graph_cache: Dict[str, Any] = {}
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        # Variables are passed as a JIT ARGUMENT everywhere, never closed
        # over: on the axon backend, arrays embedded as program CONSTANTS
        # execute ~1000x slower (measured round 2: the params-closure
        # forward ran 267 ms/batch vs 0.015 ms with params as an arg —
        # scripts/tpu_grid_microbench.py fwdref-argparams).
        self._variables = variables
        self._fwd = lambda v, b: model.apply(v, b, deterministic=True)["pred"]
        self.n_dev = 1
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            from jax import shard_map

            self.n_dev = int(mesh.shape.get("data", 1))
            self._apply_fn = jax.jit(
                shard_map(
                    lambda v, b: self._fwd(v, jax.tree.map(lambda x: x[0], b)),
                    mesh=mesh,
                    in_specs=(P(), P("data")),
                    out_specs=P("data"),
                    check_vma=False,
                )
            )
        else:
            self._apply_fn = jax.jit(self._fwd)
        self._apply = lambda b: self._apply_fn(self._variables, b)
        self._topk_fns: Dict[Tuple[int, bool], Any] = {}

    def _device_topk(self, k: int, minimize: bool):
        """Jitted forward + on-device top-k (values de-sign-flipped).
        Returned fn signature: ``fn(variables, batch)``."""
        key = (k, minimize)
        if key not in self._topk_fns:
            def fn(v, batch):
                pred = self._fwd(v, batch)
                score = jnp.where(
                    batch.sample_mask > 0,
                    -pred if minimize else pred,
                    -jnp.inf,
                )
                vals, idx = jax.lax.top_k(score, k)
                return (-vals if minimize else vals), idx

            self._topk_fns[key] = jax.jit(fn)
        return self._topk_fns[key]

    def _encode(self, smiles: str):
        g = self._graph_cache.get(smiles)
        if g is None:
            g = encode_graph(smiles_to_graph(smiles), self.vocab)
            # pre-flattened columnar arrays for the native packer
            g["_atoms"] = np.asarray(g["atom_ids"], np.int32)
            g["_bonds"] = np.asarray(g["bond_ids"], np.int32)
            g["_edges"] = np.asarray(g["edge_indices"], np.int32).reshape(-1, 2)
            self._graph_cache[smiles] = g
        return g

    def _pack_native(self, graphs, side: str = "cation") -> PackedGraphs:
        """Concatenate cached per-molecule arrays, pack with the C++ packer."""
        atom_off = np.zeros(len(graphs) + 1, np.int64)
        edge_off = np.zeros(len(graphs) + 1, np.int64)
        np.cumsum([g["num_atoms"] for g in graphs], out=atom_off[1:])
        np.cumsum([len(g["bond_ids"]) for g in graphs], out=edge_off[1:])
        atoms = (np.concatenate([g["_atoms"] for g in graphs])
                 if graphs else np.zeros(0, np.int32))
        bonds = (np.concatenate([g["_bonds"] for g in graphs])
                 if graphs else np.zeros(0, np.int32))
        edges = (
            np.concatenate([g["_edges"] for g in graphs])
            if any(len(g["_edges"]) for g in graphs)
            else np.zeros((0, 2), np.int32)
        )
        node_cap, edge_cap, _, _ = self.plan.side_caps(side)
        arrays = native.pack_graphs_native(
            atoms, atom_off, bonds, edges, edge_off,
            node_cap, edge_cap,
            duplicate_edges=self.plan.duplicate_edges,
        )
        a, b, s, d, ng, nl, nm, em = arrays
        return PackedGraphs(
            atom_ids=a, bond_ids=b, src=s, dst=d, node_graph=ng,
            node_local=nl, node_mask=nm, edge_mask=em,
            n_graphs=self.plan.batch_size,
            node_sorted=True,  # C++ packer forward-fills pad ids
        )

    def _record(self, cation: str, anion: str, t: float) -> Dict[str, Any]:
        return {
            "pair_id": "",
            "cation": self._encode(cation),
            "anion": self._encode(anion),
            "T": t,
            self.plan.target_key: 0.0,
        }

    def _build_batch(self, candidates: Sequence[Tuple[str, str, float]]) -> IonPairBatch:
        n = len(candidates)
        if native.native_available():
            cat_graphs = [self._encode(c) for c, _, _ in candidates]
            an_graphs = [self._encode(a) for _, a, _ in candidates]
            B = self.plan.batch_size
            temp = np.zeros((B, 1), np.float32)
            mask = np.zeros(B, np.float32)
            if self.plan.with_temperature:
                temp[:n, 0] = [t for _, _, t in candidates]
            mask[:n] = 1.0
            batch = IonPairBatch(
                cation=self._pack_native(cat_graphs),
                anion=self._pack_native(an_graphs, side="anion"),
                temperature=temp,
                y=np.zeros(B, np.float32),
                sample_mask=mask,
            )
        else:
            records = [self._record(c, a, t) for c, a, t in candidates]
            batch = pack_ion_pair_batch(
                records,
                batch_size=self.plan.batch_size,
                node_cap=self.plan.node_cap,
                edge_cap=self.plan.edge_cap,
                target_key=self.plan.target_key,
                with_temperature=self.plan.with_temperature,
                duplicate_edges=self.plan.duplicate_edges,
                anion_node_cap=self.plan.anion_node_cap,
                anion_edge_cap=self.plan.anion_edge_cap,
            )
        if self.plan.edge_layout == "window":
            from .data.packing import window_tile_batch

            batch = window_tile_batch(batch, self._edge_tile(),
                                      self.plan.window,
                                      anion_tile=self._edge_tile("anion"))
        return batch

    def _edge_tile(self, side: str = "cation") -> int:
        """Static per-window edge tile for window-layout batches. Uses the
        plan's (per-side) tile when set; otherwise an absolute chemical
        bound — every real edge is counted at its dst, so a window holds at
        most ``window × max-atom-degree (6, hypervalent) × duplication``
        edges. The host tiler still RAISES on overflow, never truncates."""
        _, _, tile, _ = self.plan.side_caps(side)
        if tile > 0:
            return tile
        dup = 2 if self.plan.duplicate_edges else 1
        return self.plan.window * 6 * dup

    def predict_batch(self, candidates: Sequence[Tuple[str, str, float]]) -> np.ndarray:
        """Predict up to ``n_dev · plan.batch_size`` candidates → (len,)."""
        n = len(candidates)
        B = self.plan.batch_size
        if n > self.n_dev * B:
            raise ValueError(f"{n} candidates > {self.n_dev} x batch {B}")
        if self.n_dev == 1:
            if n > B:
                raise ValueError(f"{n} candidates > batch size {B}")
            pred = np.asarray(self._apply(self._build_batch(candidates)))[:n]
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            chunks = [list(candidates[i * B:(i + 1) * B]) for i in range(self.n_dev)]
            batches = [self._build_batch(c) for c in chunks]
            stacked = jax.tree.map(lambda *xs: np.stack(xs), *batches)
            sharding = NamedSharding(self.mesh, P("data"))
            stacked = jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)
            out = np.asarray(self._apply(stacked))  # (n_dev * B,)
            pred = np.concatenate(
                [out[i * B:i * B + len(c)] for i, c in enumerate(chunks)]
            )
        if self.normalizer is not None:
            pred = self.normalizer.inverse(pred)
        return pred

    def screen(
        self,
        candidates: Iterable[Tuple[str, str, float]],
        top_k: int = 0,
        minimize: bool = True,
        skip_invalid: bool = True,
    ) -> Iterator[ScreenResult]:
        """Stream predictions; with ``top_k`` > 0, yield only the final
        best-k (lowest prediction if ``minimize``) after the sweep."""
        heap: List[Tuple[float, ScreenResult]] = []
        buf: List[Tuple[str, str, float]] = []

        def flush() -> Iterator[ScreenResult]:
            if not buf:
                return
            preds = self.predict_batch(buf)
            for (c, a, t), p in zip(buf, preds):
                r = ScreenResult(c, a, t, float(p))
                if top_k:
                    key = -r.prediction if minimize else r.prediction
                    if len(heap) < top_k:
                        heapq.heappush(heap, (key, r))
                    else:
                        heapq.heappushpop(heap, (key, r))
                else:
                    yield r
            buf.clear()

        for cand in candidates:
            if skip_invalid:
                try:
                    self._encode(cand[0])
                    self._encode(cand[1])
                except (ValueError, KeyError):
                    continue
            buf.append(cand)
            if len(buf) >= self.plan.batch_size:
                yield from flush()
        yield from flush()

        if top_k:
            results = [r for _, r in heap]
            results.sort(key=lambda r: r.prediction, reverse=not minimize)
            for r in results:
                yield r

    # ------------------------------------------------------------------
    # Grid sweeps (BASELINE config 5): vectorized packing + pack-ahead
    # pipeline + on-device top-k
    # ------------------------------------------------------------------

    def _pack_side_cols(self, cols, plan: BatchPlan,
                        side: str = "cation") -> PackedGraphs:
        atoms, a_off, bonds, edges, e_off = cols
        node_cap, edge_cap, _, _ = plan.side_caps(side)
        arrays = native.pack_graphs_native(
            atoms, a_off, bonds, edges, e_off,
            node_cap, edge_cap,
            duplicate_edges=plan.duplicate_edges,
        )
        a, b, s, d, ng, nl, nm, em = arrays
        return PackedGraphs(
            atom_ids=a, bond_ids=b, src=s, dst=d, node_graph=ng,
            node_local=nl, node_mask=nm, edge_mask=em,
            n_graphs=plan.batch_size,
            node_sorted=True,  # C++ packer forward-fills pad ids
        )

    def screen_grid(
        self,
        cations: Sequence[str],
        anions: Sequence[str],
        temperatures,
        top_k: int = 100,
        minimize: bool = True,
        pack_ahead: int = 4,
        progress_every: int = 0,
        device_pack: bool = True,
        steps_per_call: int = 8,
        per_side_caps: bool = True,
        lane_aligned_tiles: bool = True,
    ) -> "SweepReport":
        """Sweep the full cation x anion x T grid; returns the global top-k.

        ``per_side_caps`` (default) sizes the anion side's node/edge planes
        (and, on the aligned device layout, its placement pitch) by the
        anion pool's OWN statistics instead of the shared cation-or-max
        caps — same argument as the train step's per-side capacities
        (battery 27). ``False`` restores the shared sizing (A/B control).

        ``lane_aligned_tiles`` (default) rounds the aligned device pools'
        per-molecule edge capacity so the implicit per-window edge tile
        (``(window//pitch)·em``) is a 128-LANE multiple — battery 41
        found misaligned tiles run the batched one-hot matmuls ~2.4×
        slower than the padding they avoid (AXON findings 4e). ``False``
        keeps the tight ``em`` (A/B control).

        Default path (``device_pack=True``): the unique-ion pools are
        uploaded to the device ONCE and every batch is reconstructed
        inside the jitted program from a scalar grid offset
        (:mod:`ionic_mpnn_tpu.ops.grid_pack`) — candidate indices, packed
        COO arrays, forward, and per-batch top-k all run on device, with
        ``steps_per_call`` batches folded into one ``lax.scan`` dispatch.
        Per-dispatch host→device traffic is ~8 bytes; the host only merges
        ``top_k`` survivors per dispatch. (Round-2 measurement: the host
        path below was link/pack-bound at ~4.2k pairs/s on the 10M sweep
        while the device forward sustains millions of pairs/s.)

        Fallback path (``device_pack=False``): vectorized numpy + the C++
        packer in a pack-ahead producer thread, full batches shipped to
        the device. Invalid SMILES are dropped once, at pool build, with
        audit, in both paths.

        Static capacities are computed EXACTLY from the deterministic grid
        (max per-batch node/edge requirement via one cumsum over the
        candidate axis) — tight enough to keep multi-million-edge batches
        inside HBM, safe for every batch in the sweep.
        """
        import time as _time

        if not device_pack and not native.native_available():
            raise RuntimeError("screen_grid host path requires the native packer")
        cat_pool = IonPool(cations, self.vocab)
        an_pool = IonPool(anions, self.vocab)
        temps = np.atleast_1d(np.asarray(temperatures, np.float32))
        C, A, T = len(cat_pool), len(an_pool), len(temps)
        total = C * A * T
        B = self.plan.batch_size

        # exact static caps for THIS sweep: per-candidate sizes -> cumsum ->
        # max over batch windows (per side; the packer pads to these once)
        def _batch_max(lens_per_candidate: np.ndarray) -> int:
            csum = np.zeros(total + 1, np.int64)
            np.cumsum(lens_per_candidate, out=csum[1:])
            bounds = np.arange(0, total + B, B).clip(max=total)
            return int(np.diff(csum[bounds]).max())

        # cation-FASTEST enumeration: consecutive candidates cycle through
        # the cation library, so every batch mixes molecule sizes instead
        # of packing B copies of the largest cation (tighter caps)
        gids = np.arange(total, dtype=np.int64)
        ci_all = gids % C
        ai_all = (gids // C) % A
        from .data.packing import round_up

        dup = 2 if self.plan.duplicate_edges else 1  # parity fwd+rev
        # window-tiled edge layout when the model runs the all-MXU onehot
        # message path; per-window tile sized by the proven pool bound.
        # Every capacity below is PER-SIDE: anions are typically ~3x
        # smaller than cations, so sizing both sides by the shared max
        # wastes most of the anion plane — the same argument that took the
        # train step 11.88 → 7.26 ms (per-side caps, RESULTS battery 27).
        layout = self.plan.edge_layout
        window = self.plan.window
        edge_tile = an_edge_tile = 0
        pitch = an_pitch = 0
        node_mult = 128
        node_cap = an_node_cap = None
        if per_side_caps:
            cat_a_stats, cat_e_stats = cat_pool.a_len, cat_pool.e_len
            an_a_stats, an_e_stats = an_pool.a_len, an_pool.e_len
            bm_cat_a = _batch_max(cat_pool.a_len[ci_all])
            bm_an_a = _batch_max(an_pool.a_len[ai_all])
            bm_cat_e = _batch_max(cat_pool.e_len[ci_all])
            bm_an_e = _batch_max(an_pool.e_len[ai_all])
        else:  # shared (cation-or-max) sizing — the A/B control
            cat_a_stats = an_a_stats = np.concatenate(
                [cat_pool.a_len, an_pool.a_len])
            cat_e_stats = an_e_stats = np.concatenate(
                [cat_pool.e_len, an_pool.e_len])
            bm_cat_a = bm_an_a = max(_batch_max(cat_pool.a_len[ci_all]),
                                     _batch_max(an_pool.a_len[ai_all]))
            bm_cat_e = bm_an_e = max(_batch_max(cat_pool.e_len[ci_all]),
                                     _batch_max(an_pool.e_len[ai_all]))
        if self._aligned_requested and device_pack:
            # device sweeps CAN run the aligned (halo-free) layout: fixed
            # node pitch makes the aligned offsets closed-form (the greedy
            # host alignment is inherently sequential), so batches still
            # build from one scalar. Tile = (window/pitch) slots × largest
            # ion's edges; src context shrinks 3× vs the halo layout.
            from .ops.grid_pack import pool_aligned_tile_bound, pool_pitch

            pitch = pool_pitch(cat_a_stats, window)
            an_pitch = pool_pitch(an_a_stats, window)
            if (B * pitch) % window == 0 and (B * an_pitch) % window == 0:
                layout = "window_aligned"
                edge_tile = pool_aligned_tile_bound(
                    dup * cat_e_stats, window, pitch)
                an_edge_tile = pool_aligned_tile_bound(
                    dup * an_e_stats, window, an_pitch)
                node_cap = B * pitch  # exact: pack_side_on_device contract
                an_node_cap = B * an_pitch
            else:  # tiny batches: fall back to the halo layout
                pitch = an_pitch = 0
        if layout == "window":
            from .ops.grid_pack import pool_window_tile_bound

            node_mult = max(node_mult, window)
            a_all = np.concatenate([cat_pool.a_len, an_pool.a_len])
            if a_all.size and int(a_all.max()) > window:
                raise ValueError(
                    f"onehot window {window} < largest ion "
                    f"({int(a_all.max())} atoms) — locality contract broken"
                )
            edge_tile = pool_window_tile_bound(
                cat_a_stats, dup * cat_e_stats, window)
            an_edge_tile = pool_window_tile_bound(
                an_a_stats, dup * an_e_stats, window)
        if node_cap is None:
            node_cap = round_up(bm_cat_a, node_mult)
            an_node_cap = round_up(bm_an_a, node_mult)
        plan = BatchPlan(
            batch_size=B,
            node_cap=node_cap,
            edge_cap=round_up(dup * bm_cat_e, 128),
            duplicate_edges=self.plan.duplicate_edges,
            with_temperature=self.plan.with_temperature,
            target_key=self.plan.target_key,
            edge_layout=layout,
            edge_tile=edge_tile,
            window=window,
            pitch=pitch,
            anion_node_cap=an_node_cap,
            anion_edge_cap=round_up(dup * bm_an_e, 128),
            anion_edge_tile=an_edge_tile,
            anion_pitch=an_pitch,
        )
        del gids, ci_all, ai_all
        k_batch = int(min(top_k, B))
        if device_pack:
            return self._screen_grid_device(
                cat_pool, an_pool, temps, plan, top_k, k_batch, minimize,
                max(1, int(steps_per_call)), progress_every,
                lane_aligned_tiles=lane_aligned_tiles,
            )
        topk_fn = self._device_topk(k_batch, minimize)

        def build(g0: int, g1: int):
            gids = np.arange(g0, g1, dtype=np.int64)
            ci = gids % C
            ai = (gids // C) % A
            ti = gids // (C * A)
            n = len(gids)
            temp = np.zeros((B, 1), np.float32)
            mask = np.zeros(B, np.float32)
            if plan.with_temperature:
                temp[:n, 0] = temps[ti]
            mask[:n] = 1.0
            batch = IonPairBatch(
                cation=self._pack_side_cols(cat_pool.gather(ci), plan),
                anion=self._pack_side_cols(an_pool.gather(ai), plan,
                                           side="anion"),
                temperature=temp,
                y=np.zeros(B, np.float32),
                sample_mask=mask,
            )
            if plan.edge_layout == "window":
                from .data.packing import window_tile_batch

                batch = window_tile_batch(
                    batch, plan.edge_tile, plan.window,
                    anion_tile=plan.anion_edge_tile)
            return batch, ci, ai, ti

        q: "queue.Queue" = queue.Queue(maxsize=pack_ahead)

        def producer():
            for g0 in range(0, total, B):
                build_args = build(g0, min(g0 + B, total))
                q.put(build_args)
            q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        t0 = _time.perf_counter()
        thread.start()

        heap: List[Tuple[float, int, int, int]] = []  # (key, ci, ai, ti)
        done = 0
        wait_s = device_s = 0.0
        while True:
            t_w = _time.perf_counter()
            item = q.get()
            wait_s += _time.perf_counter() - t_w
            if item is None:
                break
            batch, ci, ai, ti = item
            t_d = _time.perf_counter()
            vals, idx = topk_fn(self._variables, batch)
            vals = np.asarray(vals)
            idx = np.asarray(idx)
            device_s += _time.perf_counter() - t_d
            n = len(ci)
            for v, i in zip(vals, idx):
                if i >= n:  # padded slot (masked to -inf score)
                    continue
                key = -float(v) if minimize else float(v)
                entry = (key, int(ci[i]), int(ai[i]), int(ti[i]))
                if len(heap) < top_k:
                    heapq.heappush(heap, entry)
                else:
                    heapq.heappushpop(heap, entry)
            done += n
            if progress_every and done % progress_every < B:
                dt = _time.perf_counter() - t0
                print(f"[screen] {done}/{total} ({done/dt:,.0f} pairs/s)",
                      flush=True)
        thread.join()
        dt = _time.perf_counter() - t0

        results = []
        for key, ci_, ai_, ti_ in sorted(heap, reverse=True):
            pred = -key if minimize else key
            if self.normalizer is not None:
                pred = float(self.normalizer.inverse(np.float32(pred)))
            results.append(ScreenResult(
                cation=cat_pool.smiles[ci_], anion=an_pool.smiles[ai_],
                temperature=float(temps[ti_]), prediction=pred,
            ))
        return SweepReport(
            results=results,
            n_screened=total,
            pairs_per_s=total / dt,
            wall_s=dt,
            skipped=cat_pool.skipped + an_pool.skipped,
            producer_wait_s=wait_s,
            device_s=device_s,
        )

    # ------------------------------------------------------------------
    # Factorized grid sweeps: encode each unique ion ONCE
    # ------------------------------------------------------------------

    def _project_pool(self, pool: IonPool, side: str,
                      ions_per_batch: int = 512) -> np.ndarray:
        """Per-ion mixing projections (len(pool), mixing_size), computed by
        running ONE side's encoder over the unique-ion pool in fixed-shape
        packed batches (gather impl — a few thousand molecules total)."""
        import dataclasses as _dc

        from .data.packing import pack_graphs, round_up
        from .models.dual_encoder import DualEncoderTrunk

        cfg = _dc.replace(self.model.cfg, message_impl="gather")
        trunk = DualEncoderTrunk(cfg)
        tvars = {"params": self._variables["params"]["trunk"]}
        fwd = jax.jit(
            lambda v, g: trunk.apply(v, g, side, True,
                                     method=DualEncoderTrunk.project_side)
        )
        M = len(pool)
        Bp = min(ions_per_batch, M)
        dup = self.plan.duplicate_edges
        mult = 2 if dup else 1
        node_cap = round_up(max(int(pool.a_len.max(initial=1)) * Bp, 8), 8)
        edge_cap = round_up(max(int(pool.e_len.max(initial=1)) * Bp * mult, 8), 8)
        out = np.zeros((M, self.model.cfg.mixing_size), np.float32)
        for i0 in range(0, M, Bp):
            idx = np.arange(i0, min(i0 + Bp, M))
            graphs = [
                {
                    "atom_ids": pool.atoms[pool.a_start[i]:pool.a_start[i] + pool.a_len[i]],
                    "bond_ids": pool.bonds[pool.e_start[i]:pool.e_start[i] + pool.e_len[i]],
                    "edge_indices": pool.edges[pool.e_start[i]:pool.e_start[i] + pool.e_len[i]],
                    "num_atoms": int(pool.a_len[i]),
                }
                for i in idx
            ]
            graphs += [
                {"atom_ids": [], "bond_ids": [], "edge_indices": [], "num_atoms": 0}
            ] * (Bp - len(idx))
            packed = pack_graphs(graphs, node_cap, edge_cap, Bp,
                                 duplicate_edges=dup)
            out[idx] = np.asarray(fwd(tvars, packed))[: len(idx)]
        return out

    @staticmethod
    def _staged_top_k(flat: jnp.ndarray, k: int):
        """Exact top-k over a huge flat score vector: lax.top_k is
        sort-bound at tens of millions of elements (measured ~60 s per
        64M block on the v5e relay); chunk, keep each chunk's top-k, then
        select over the union — exact because the global top-k is a
        subset of the union."""
        chunk = 65536
        if flat.size > 4 * chunk and flat.size > 4 * k:
            pad = (-flat.size) % chunk
            flat = jnp.pad(flat, (0, pad), constant_values=-jnp.inf)
            rows = flat.reshape(-1, chunk)
            kk = min(k, chunk)
            v1, i1 = jax.lax.top_k(rows, kk)  # (R, kk)
            base = (jnp.arange(rows.shape[0], dtype=jnp.int32) * chunk)[:, None]
            vals, i2 = jax.lax.top_k(v1.reshape(-1), k)
            idx = (base + i1).reshape(-1)[i2]
            return vals, idx
        return jax.lax.top_k(flat, min(k, flat.size))

    def _merged_report(self, merged, k, minimize, decode, cat_pool, an_pool,
                       total, dt) -> "SweepReport":
        """Shared block-merge → de-normalize → ScreenResult assembly for
        the factorized sweeps. ``decode(gid) -> (ci, ai, T)``."""
        merged.sort(reverse=True)
        results = []
        for v, gid in merged[:k]:
            pred = -float(v) if minimize else float(v)
            if self.normalizer is not None:
                pred = float(self.normalizer.inverse(np.float32(pred)))
            ci_, ai_, t_val = decode(int(gid))
            results.append(ScreenResult(
                cation=cat_pool.smiles[ci_], anion=an_pool.smiles[ai_],
                temperature=t_val, prediction=pred,
            ))
        return SweepReport(
            results=results, n_screened=total,
            pairs_per_s=total / dt if dt > 0 else 0.0, wall_s=dt,
            skipped=cat_pool.skipped + an_pool.skipped,
            producer_wait_s=0.0, device_s=dt,
        )

    @staticmethod
    def _head_from_mixed(cfg, variables, mixed: jnp.ndarray) -> jnp.ndarray:
        """Apply the non-VFT head (``"mlp"`` | ``"transfer"``) to mixed
        representations (P, m) → (P,) predictions, replicating the model's
        head layers from the given variables (deterministic/inference
        mode; BatchNorm uses running stats). Variables are threaded as
        jit ARGUMENTS by callers — never closed over (CLAUDE.md: embedded
        HLO constants run ~100-1000× slower on this backend). Pinned
        against the full model by the factorized-vs-brute parity tests."""
        p = variables["params"]
        relu = jax.nn.relu
        if cfg.head == "mlp":
            h = relu(mixed @ p["head_dense"]["kernel"] + p["head_dense"]["bias"])
            return (h @ p["head_out"]["kernel"] + p["head_out"]["bias"])[:, 0]
        if cfg.head == "transfer":
            h = relu(mixed @ p["mp_dense_1"]["kernel"] + p["mp_dense_1"]["bias"])
            bn = p["mp_bn_1"]
            stats = variables["batch_stats"]["mp_bn_1"]
            h = (h - stats["mean"]) / jnp.sqrt(stats["var"] + 1e-3)
            h = h * bn["scale"] + bn["bias"]
            h = relu(h @ p["mp_dense_2"]["kernel"] + p["mp_dense_2"]["bias"])
            # dropout is identity in deterministic mode
            h = relu(h @ p["mp_dense_3"]["kernel"] + p["mp_dense_3"]["bias"])
            return (h @ p["melting_point"]["kernel"]
                    + p["melting_point"]["bias"])[:, 0]
        raise ValueError(f"no factorized head for {cfg.head!r}")

    def screen_grid_factorized(
        self,
        cations: Sequence[str],
        anions: Sequence[str],
        temperatures=(),
        top_k: int = 100,
        minimize: bool = True,
        progress_every: int = 0,  # accepted for API parity; sweep is 1 dispatch
        block_elems: int = 64_000_000,  # max (CB, A, T) score elements per dispatch
    ) -> "SweepReport":
        """Exact-math factorized grid sweep.

        The trunk's ``mixed`` representation is an elementwise SUM of
        per-ion projections, so the sweep encodes C + A unique ions ONCE
        instead of once per candidate pair (~1000× less encoder work for
        the 10M BASELINE config-5 grid).

        * VFT head (viscosity): ``Dense(3)`` is linear over ``mixed``, so
          per-ion 3-vectors ``u = proj @ W`` (bias folded into the anion
          side) turn every candidate into ``(a, b, c) =
          clip/softplus(u_c + u_a)`` and ``log10(eta) = a + b/(T/100 + c
          + eps)`` — a blocked (C, A, T) elementwise evaluation + exact
          two-stage top-k on device.
        * MLP/transfer heads (melting point — no temperature input): the
          head runs per PAIR on ``mixed = proj_c[ci] + proj_a[ai]``,
          blocked over cations the same way.

        Predictions match :meth:`screen_grid` (same ops, same dtype; only
        the batching differs).
        """
        import time as _time

        cfg = self.model.cfg
        t0 = _time.perf_counter()
        if cfg.head != "vft":
            return self._screen_pairs_factorized(
                cations, anions, top_k, minimize, block_elems, t0,
            )
        cat_pool = IonPool(cations, self.vocab)
        an_pool = IonPool(anions, self.vocab)
        temps = np.atleast_1d(np.asarray(temperatures, np.float32))
        C, A, T = len(cat_pool), len(an_pool), len(temps)
        total = C * A * T
        k = int(min(top_k, total))
        if total == 0:  # every candidate ion skipped (audited), or empty T
            return self._merged_report([], 0, minimize, None, cat_pool,
                                       an_pool, 0, _time.perf_counter() - t0)

        proj_c = self._project_pool(cat_pool, "cation")
        proj_a = self._project_pool(an_pool, "anion")
        head = self._variables["params"]["vft_head"]["visc_params"]
        kernel = np.asarray(head["kernel"], np.float32)  # (m, 3)
        bias = np.asarray(head["bias"], np.float32)  # (3,)
        u_c = proj_c @ kernel  # (C, 3)
        u_a = proj_a @ kernel + bias  # (A, 3)

        # block over cations so the (CB, A, T) score tensor stays HBM-safe
        # at ANY grid size (1B+ candidates); top-k merges across blocks
        CB = C if C * A * T <= block_elems else max(block_elems // max(A * T, 1), 1)
        n_blocks = -(-C // CB)

        def pair_eval(u_c_blk, n_valid, u_a, temps):
            raw = u_c_blk[:, None, :] + u_a[None, :, :]  # (CB, A, 3)
            a = raw[..., 0]
            b = jnp.clip(jax.nn.softplus(raw[..., 1]), *cfg.vft_b_clip)
            c = jnp.clip(jax.nn.softplus(raw[..., 2]), *cfg.vft_c_clip)
            t = temps / cfg.t_scale  # (T,)
            pred = a[..., None] + b[..., None] / (t + c[..., None] + cfg.vft_eps)
            score = -pred if minimize else pred
            # mask padded cation rows of the last block
            row_ok = jnp.arange(score.shape[0]) < n_valid
            score = jnp.where(row_ok[:, None, None], score, -jnp.inf)
            return self._staged_top_k(score.reshape(-1), k)

        fn = jax.jit(pair_eval)
        merged: List[Tuple[float, int]] = []
        for blk in range(n_blocks):
            c0 = blk * CB
            blk_u = np.zeros((CB, 3), np.float32)
            n_valid = min(CB, C - c0)
            blk_u[:n_valid] = u_c[c0:c0 + n_valid]
            vals, idx = fn(jnp.asarray(blk_u), jnp.int32(n_valid),
                           jnp.asarray(u_a), jnp.asarray(temps))
            vals, idx = np.asarray(vals), np.asarray(idx)
            ok = np.isfinite(vals)
            merged.extend(zip(vals[ok].tolist(),
                              (idx[ok].astype(np.int64) + c0 * A * T).tolist()))

        def decode(gid: int):
            ci_, rest = divmod(gid, A * T)
            ai_, ti_ = divmod(rest, T)
            return ci_, ai_, float(temps[ti_])

        return self._merged_report(merged, k, minimize, decode, cat_pool,
                                   an_pool, total, _time.perf_counter() - t0)

    def _screen_pairs_factorized(
        self, cations, anions, top_k, minimize, block_elems, t0,
    ) -> "SweepReport":
        """Factorized sweep for T-free heads: per-pair head evaluation on
        ``mixed = proj_c[ci] + proj_a[ai]``, blocked over cations."""
        import time as _time

        cfg = self.model.cfg
        cat_pool = IonPool(cations, self.vocab)
        an_pool = IonPool(anions, self.vocab)
        C, A = len(cat_pool), len(an_pool)
        total = C * A
        k = int(min(top_k, total))
        if total == 0:
            return self._merged_report([], 0, minimize, None, cat_pool,
                                       an_pool, 0, _time.perf_counter() - t0)
        proj_c = jnp.asarray(self._project_pool(cat_pool, "cation"))
        proj_a = jnp.asarray(self._project_pool(an_pool, "anion"))

        # budget ROWS, not scores: unlike the VFT path (3 floats per
        # candidate), the head materializes (rows, mixing + widest-layer)
        # activations per block
        widest = {"mlp": cfg.fp_size, "transfer": max(cfg.transfer_dims)}.get(
            cfg.head, cfg.fp_size
        )
        row_budget = max(block_elems // (cfg.mixing_size + widest), 1)
        CB = C if total <= row_budget else max(row_budget // max(A, 1), 1)
        n_blocks = -(-C // CB)

        def block_eval(v, pc_blk, n_valid, pa):
            mixed = (pc_blk[:, None, :] + pa[None, :, :]).reshape(-1, pc_blk.shape[-1])
            pred = self._head_from_mixed(cfg, v, mixed)  # (CB*A,)
            score = -pred if minimize else pred
            row_ok = (jnp.arange(score.shape[0]) // A) < n_valid
            score = jnp.where(row_ok, score, -jnp.inf)
            return self._staged_top_k(score, k)

        # variables threaded as a jit ARGUMENT (closed-over device arrays
        # embed as HLO constants and run ~100-1000x slower here)
        fn = jax.jit(block_eval)
        merged: List[Tuple[float, int]] = []
        for blk in range(n_blocks):
            c0 = blk * CB
            n_valid = min(CB, C - c0)
            pc_blk = jnp.zeros((CB, proj_c.shape[1]), proj_c.dtype
                               ).at[:n_valid].set(proj_c[c0:c0 + n_valid])
            vals, idx = fn(self._variables, pc_blk, jnp.int32(n_valid), proj_a)
            vals, idx = np.asarray(vals), np.asarray(idx)
            ok = np.isfinite(vals)
            merged.extend(zip(vals[ok].tolist(),
                              (idx[ok].astype(np.int64) + c0 * A).tolist()))

        def decode(gid: int):
            ci_, ai_ = divmod(gid, A)
            return ci_, ai_, 0.0

        return self._merged_report(merged, k, minimize, decode, cat_pool,
                                   an_pool, total, _time.perf_counter() - t0)

    def _screen_grid_device(
        self,
        cat_pool: IonPool,
        an_pool: IonPool,
        temps: np.ndarray,
        plan: BatchPlan,
        top_k: int,
        k_batch: int,
        minimize: bool,
        K: int,
        progress_every: int,
        lane_aligned_tiles: bool = True,
    ) -> "SweepReport":
        """Device-resident sweep: pools uploaded once, batches rebuilt on
        device from a scalar grid offset, K batches per dispatch."""
        import time as _time

        from .ops.grid_pack import device_pool, grid_batch_on_device

        C, A, T = len(cat_pool), len(an_pool), len(temps)
        total = C * A * T
        B = plan.batch_size

        # grid shape (C, A, total) threaded as TRACED scalars: the
        # compiled executable is then independent of sweep size, so a 200k
        # probe, a 2M A/B and a 10M production sweep share one program
        # (cold remote compiles cost minutes per program — battery 30)
        def one(v, cat_d, an_d, temps_d, g0, c_n, a_n, tot):
            batch = grid_batch_on_device(
                cat_d, an_d, temps_d, g0,
                n_cations=c_n, n_anions=a_n, total=tot, batch_size=B,
                node_cap=plan.node_cap, edge_cap=plan.edge_cap,
                duplicate_edges=plan.duplicate_edges,
                with_temperature=plan.with_temperature,
                edge_layout=plan.edge_layout, edge_tile=plan.edge_tile,
                window=plan.window, pitch=plan.pitch,
                anion_node_cap=plan.anion_node_cap,
                anion_edge_cap=plan.anion_edge_cap,
                anion_edge_tile=plan.anion_edge_tile,
                anion_pitch=plan.anion_pitch,
            )
            pred = self._fwd(v, batch)
            score = jnp.where(
                batch.sample_mask > 0,
                -pred if minimize else pred,
                -jnp.inf,
            )
            vals, idx = jax.lax.top_k(score, k_batch)
            return vals, g0 + idx.astype(jnp.int32)

        if K == 1:
            dispatch = one
        else:
            def dispatch(v, cat_d, an_d, temps_d, g0, c_n, a_n, tot):
                def body(carry, s):
                    return carry, one(v, cat_d, an_d, temps_d, g0 + s * B,
                                      c_n, a_n, tot)

                _, (vs, gis) = jax.lax.scan(
                    body, 0, jnp.arange(K, dtype=jnp.int32)
                )
                v2, i2 = jax.lax.top_k(vs.reshape(-1), k_batch)
                return v2, gis.reshape(-1)[i2]

        fn = jax.jit(dispatch)
        t0 = _time.perf_counter()
        # aligned sweeps build pools with molecule-major padded planes:
        # the batch then packs in B row-gathers (pack_side_padded) instead
        # of per-element gathers — the element-gather pack measured 91.5
        # ms/batch at batch 4096, ~20× the forward (battery 30)
        aligned = plan.edge_layout == "window_aligned"

        def _em_mult(p):
            # lane-align the implicit pack_side_padded tile (gpw·em):
            # em must be a multiple of 128·pitch/window (AXON 4e)
            if not (aligned and lane_aligned_tiles and p):
                return 1
            return max(1, (128 * p) // plan.window)

        cat_d = device_pool(cat_pool, duplicate_edges=plan.duplicate_edges,
                            pitch=plan.pitch if aligned else 0,
                            em_multiple=_em_mult(plan.pitch))
        an_d = device_pool(an_pool, duplicate_edges=plan.duplicate_edges,
                           pitch=(plan.anion_pitch or plan.pitch)
                           if aligned else 0,
                           em_multiple=_em_mult(plan.anion_pitch
                                                or plan.pitch))
        temps_d = jnp.asarray(temps, jnp.float32)

        heap: List[Tuple[float, int]] = []  # (score, gid); score: higher=better

        def merge(vals: np.ndarray, gids: np.ndarray) -> None:
            for v, gid in zip(vals, gids):
                if not np.isfinite(v):
                    continue
                entry = (float(v), int(gid))
                if len(heap) < top_k:
                    heapq.heappush(heap, entry)
                else:
                    heapq.heappushpop(heap, entry)

        # one-deep software pipeline: merge batch i while i+1 is in flight
        pending = None
        done = 0
        device_s = 0.0
        t_warm = done_warm = 0.0  # clock/progress after the FIRST sync
        for g0 in range(0, total, B * K):
            t_d = _time.perf_counter()
            out = fn(self._variables, cat_d, an_d, temps_d, jnp.int32(g0),
                     jnp.int32(C), jnp.int32(A), jnp.int32(total))
            if pending is not None:
                # np.asarray blocks until the PREVIOUS dispatch completes —
                # this sync (not the async fn() call) is the device time
                vals_h, gids_h = np.asarray(pending[0]), np.asarray(pending[1])
                device_s += _time.perf_counter() - t_d
                merge(vals_h, gids_h)
                if t_warm == 0.0:
                    # first completed dispatch: everything before this point
                    # is dominated by jit compile + pool upload on cold
                    # caches — steady-state rate starts here
                    t_warm = _time.perf_counter()
                    done_warm = g0  # candidates the synced dispatch covered
            else:
                device_s += _time.perf_counter() - t_d
            pending = out
            done = min(g0 + B * K, total)
            if progress_every and done % progress_every < B * K:
                dt = _time.perf_counter() - t0
                print(f"[screen] {done}/{total} ({done/dt:,.0f} pairs/s)",
                      flush=True)
        if pending is not None:
            merge(np.asarray(pending[0]), np.asarray(pending[1]))
        dt = _time.perf_counter() - t0
        steady = 0.0
        if t_warm and total > done_warm:
            steady = (total - done_warm) / (_time.perf_counter() - t_warm)

        results = []
        for score, gid in sorted(heap, reverse=True):
            pred = -score if minimize else score
            if self.normalizer is not None:
                pred = float(self.normalizer.inverse(np.float32(pred)))
            ci_, ai_, ti_ = gid % C, (gid // C) % A, gid // (C * A)
            results.append(ScreenResult(
                cation=cat_pool.smiles[ci_], anion=an_pool.smiles[ai_],
                temperature=float(temps[ti_]), prediction=pred,
            ))
        return SweepReport(
            results=results,
            n_screened=total,
            pairs_per_s=total / dt,
            wall_s=dt,
            skipped=cat_pool.skipped + an_pool.skipped,
            producer_wait_s=0.0,
            device_s=device_s,
            steady_pairs_per_s=steady,
        )
