"""read_tpu — a TPU-native neural point-rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of READ
("Large-Scale Neural Scene Rendering for Autonomous Driving", AAAI 2023):
fit a photogrammetry point cloud with per-point learnable neural descriptors
and a MIMO-UNet refinement network against posed photos, then synthesize
novel driving-scene views in real time.

Subpackages
-----------
- ``read_tpu.scene``     — scene manifests, camera math, PLY/XML/txt IO,
                           input-format DSL.
- ``read_tpu.ops``       — device compute: the z-buffer point-splat
                           rasterizer (XLA scatter + Pallas kernels),
                           image resampling, homography warps.
- ``read_tpu.models``    — flax modules: PointTexture / MeshTexture,
                           the gated-conv MIMO-UNet, composition wrappers.
- ``read_tpu.criterions``— VGG perceptual loss, huber, PSNR/SSIM metrics.
- ``read_tpu.data``      — host-side dataset: crop sampling, intrinsics
                           jitter, split policies.
- ``read_tpu.pipelines`` — experiment wiring (TexturePipeline etc.),
                           train state, optimizers, checkpointing.
- ``read_tpu.parallel``  — mesh construction, sharded rasterization and
                           sharded texture tables.
"""

__version__ = "0.1.0"
