"""cednerf_tpu — a TPU-native dynamic-NeRF framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of Ced-NeRF ("A Compact and
Efficient Method for Dynamic Neural Radiance Fields"; reference surveyed in
SURVEY.md): a multiresolution hash-grid radiance field with a motion-warp MLP
and motion-attenuated time embeddings, occupancy-grid accelerated ray
marching, and per-ray alpha-composited volume rendering with
distortion/opacity/feature-prediction regularizers.

Design stance (TPU-first, not a port):
  * padded, device-resident, fixed-shape ray/sample batches with validity
    masks instead of the CUDA reference's ragged packed samples,
  * the whole train step (occupancy update + marching + rendering + loss +
    optimizer) is a single jitted program,
  * bf16 compute / fp32 params (no GradScaler needed, unlike the fp16 CUDA
    reference),
  * scale-out via jax.sharding over a ray-sharded device mesh.
"""

__version__ = "0.1.0"
