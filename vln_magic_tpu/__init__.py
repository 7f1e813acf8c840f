"""vln_magic_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of VLN-MAGIC (Meta-Ability Guided Interactive Chain-of-Distillation
for Vision-and-Language Navigation).

Architecture (TPU-first, not a port):

- ``env``      — the Matterport navigation world as *static padded device
                 arrays* (positions, all-pairs shortest distances, next-hop
                 tables, candidate tables). An episode step is pure array
                 indexing under ``jit``; no C++ simulator is needed because
                 rendering is disabled in the reference anyway
                 (reference: map_nav_src/r2r/env.py:51).
- ``models``   — flax.linen dual-scale cross-modal transformer (language /
                 panorama / global-map / local branches), reconstructing the
                 omitted VLNBert/GlocalTextPathCMTPreTraining models from the
                 reference's call sites (reference: map_nav_src/r2r/agent.py).
- ``agent``    — batched ``lax.scan`` rollout, DAgger/IL training, the MAKD /
                 MKRW / MKTD / ICoD distillation stack as pure functions.
- ``parallel`` — ``jax.sharding.Mesh`` + pjit/shard_map parallelism (dp/mp).
- ``ops``      — Pallas TPU kernels for the hot ops.
- ``pretrain`` — MLM/MRC/SAP/CFP proxy-task pretraining.
"""

__version__ = "0.1.0"
