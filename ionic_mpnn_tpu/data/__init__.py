"""Data tier: SMILES → graphs → vocab ids → packed device batches."""

from .featurize import smiles_to_graph, have_rdkit
from .vocab import Vocab, build_vocab
from .encode import encode_graph, encode_dataset, EncodeReport
from .packing import (
    PackedGraphs,
    IonPairBatch,
    pack_graphs,
    pack_ion_pair_batch,
    pad_dense_batch,
)
from .loader import BatchPlan, plan_capacities, iter_batches

__all__ = [
    "smiles_to_graph",
    "have_rdkit",
    "Vocab",
    "build_vocab",
    "encode_graph",
    "encode_dataset",
    "EncodeReport",
    "PackedGraphs",
    "IonPairBatch",
    "pack_graphs",
    "pack_ion_pair_batch",
    "pad_dense_batch",
    "BatchPlan",
    "plan_capacities",
    "iter_batches",
]
