"""gan_aug_pfa_tpu — TPU-native GAN-augmented change-detection framework.

A from-scratch JAX / Flax / XLA / Pallas rebuild of the capabilities of the
reference project Affi-Amine/GAN-AUG-PFA (see SURVEY.md):

  * Pix2Pix GAN (U-Net generator + 70x70 PatchGAN discriminator) for
    synthesizing post-change satellite images,
  * synthetic-data generation tool,
  * Siamese Attention U-Net change-detection model,
  * joint geometric/photometric augmentation (device-side, jitted),
  * Focal / Dice / Combined losses, ReduceLROnPlateau scheduling,
  * hyperparameter tuning (Optuna-compatible study API with a built-in
    SQLite-backed fallback implementation),
  * evaluation suite (Accuracy/Precision/Recall/F1/IoU + visualizations).

Design is TPU-first: NHWC layouts, jit-compiled train steps with fused
forward/backward/update, data parallelism expressed as sharding annotations
over a `jax.sharding.Mesh` (XLA inserts psum over ICI), the whole per-step
data pipeline (gather + augment) fused into the compiled step so the host
never touches pixels after startup.
"""

__version__ = "0.1.0"
