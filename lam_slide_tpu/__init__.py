"""lam_slide_tpu — TPU-native latent simulation engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of LaM-SLidE
(latent-space modeling of spatial dynamical systems via linked entities):

* ``nn``        — core neural building blocks (attention, norms, embeddings,
                  masked losses, EMA, LR schedules).
* ``models``    — UPT-style entity encoder/decoder and the factorized
                  spatial/temporal latent DiT.
* ``transport`` — stochastic-interpolant (SiT) training objective and
                  jit-compiled ODE/SDE samplers.
* ``ops``       — TPU kernels (Pallas flash attention, fused AdaLN) with XLA
                  reference paths.
* ``parallel``  — device-mesh / sharding utilities (data parallel over ICI).
* ``train``     — functional trainer: TrainState pytree, donated jitted steps,
                  Orbax checkpoints, local run registry.
* ``data``      — static-shape, mask-carrying data pipelines for the four
                  workloads (MD17, pedestrian, NBA, 4AA peptides).
* ``geometry``  — rigid-frame / torsion stack for all-atom peptides.
"""

__version__ = "0.1.0"
