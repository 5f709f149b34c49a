"""htd_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of HTD.

HTD ("Heterogeneous Task Decoupling for Two-Stage Object Detection",
IEEE TIP 2021, reference: CityU-AIM-Group/HTD) is a two-stage COCO
detector: Faster R-CNN with a two-stage cascade RoI head adding
SFA (semantic feature aggregation / global context), PGraph
(progressive graph reasoning for classification) and BA (border-aware
adaptation for regression).

This package is a ground-up TPU-first implementation:
  * static shapes everywhere (padded proposals + validity masks),
  * functional flax.linen models compiled with jit/pjit,
  * data parallelism over a `jax.sharding.Mesh`,
  * Pallas kernels for the gather-heavy hot ops.
"""

__version__ = "0.1.0"
