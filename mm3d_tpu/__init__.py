"""mm3d_tpu — TPU-native multimodal 3D point-cloud learning framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
`ChengnanYu/Multi-modal-Learning-on-3D-Point-Clouds` (PointNet/PointNet++
lineage + 2D-image fusion).  The reference mount is empty in this
environment (see SURVEY.md §0); the functional spec is BASELINE.json's
north-star description, and semantics of the geometry ops follow the
canonical yanx27-style pure-PyTorch definitions (re-typed locally as a
CPU oracle in `oracle/`, never copied from reference files).

Layout
------
ops/       L0 geometry kernels: pure-JAX reference impls + Pallas TPU kernels
models/    L2 Flax modules: PointNet, PointNet++ (SSG/MSG), image branch, fusion
data/      L1 loaders, synthetic dataset generators, on-device augmentation
parallel/  mesh construction, shard_map data-parallel train/eval steps
training/  train state, schedules, loops, CLI entry points
utils/     checkpointing (orbax), metrics, logging
"""

__version__ = "0.1.0"
