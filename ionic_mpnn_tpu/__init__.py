"""ionic_mpnn_tpu — a TPU-native graph message-passing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``goalheart/ionic-mpnn`` reference (edge-conditioned BondMatrixMessage
MPNNs over ionic-liquid pairs with physics-constrained property heads),
built TPU-first: packed COO graph batches + segment ops instead of padded
dense tensors, fused Pallas kernels for the bond-matrix message path, and
pjit/shard_map SPMD over device meshes instead of single-process Keras.
"""

__version__ = "0.1.0"
