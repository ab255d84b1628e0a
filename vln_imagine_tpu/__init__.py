"""vln_imagine_tpu — a TPU-native JAX/XLA/Pallas framework for imagination-augmented
Vision-and-Language Navigation (VLN) agents.

Re-implements, TPU-first, the full capability surface of the VLN-Imagine system
(CVPR'25 "Do Visual Imaginations Improve Vision-and-Language Navigation Agents?"):

- HAMT-Imagine: history-aware cross-modal transformer agent
  (reference: VLN-HAMT/finetune_src/models/vilmodel_cmt.py)
- DUET-Imagine: dual-scale global-topo-map + local-pano graph transformer agent
  (reference: VLN-DUET/map_nav_src/models/vilmodel.py)
- compiled array-based R2R environment replacing the MatterSim C++ simulator's
  graph-only mode (reference: VLN-HAMT/finetune_src/r2r/env.py)
- imitation (teacher forcing / DAgger) + A2C RL training, imagination
  contrastive auxiliary loss, three-stage warm-up schedule
- pretraining proxy tasks (MLM/MRC/ITM/SAP/SAR/SPREL for HAMT;
  MLM/MRC/SAP for DUET)
- vectorized navigation metrics (SR/SPL/nDTW/SDTW/CLS)

Design: everything on the hot path is a pure function of fixed-shape arrays so a
whole batched episode runs as a single XLA program (`jax.lax.scan` over time);
scaling is expressed with `jax.sharding.Mesh` + NamedSharding, not process-level
replication.
"""

__version__ = "0.1.0"
