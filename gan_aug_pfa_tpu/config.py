"""Configuration dataclasses for the framework.

The reference scatters configuration between module-level constants and
argparse (reference train.py:19-31, train_gan.py:17-35, evaluate.py:15-28,
generate_synthetic_data.py:13-24).  Here everything lives in typed dataclasses
with the same defaults; the CLI layer (cli.py) maps the reference's exact flag
names onto these.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# The OSCD city list and validation split, matching reference dataset.py:299-301.
ALL_CITIES = [
    "abudhabi", "aguasclaras", "beihai", "beirut", "bercy", "bordeaux",
    "cupertino", "hongkong", "mumbai", "nantes", "paris", "pisa", "rennes",
    "saclay_e",
]
VAL_CITIES = ["pisa", "rennes", "saclay_e"]
TRAIN_CITIES = [c for c in ALL_CITIES if c not in VAL_CITIES]

# Nested OSCD directory names (reference dataset.py:302-304).
DATASET_SUBDIR_DEFAULT = "Onera Satellite Change Detection Dataset"
IMAGES_SUBTREE = ("images", "Onera Satellite Change Detection dataset - Images")
LABELS_SUBTREE = (
    "train_labels",
    "Onera Satellite Change Detection dataset - Train Labels",
)
SYNTHETIC_DATA_DIR_DEFAULT = "synthetic_data"


@dataclasses.dataclass
class DataConfig:
    root_dir: str = "."
    dataset_subdir: str = DATASET_SUBDIR_DEFAULT
    synthetic_data_dir: str = SYNTHETIC_DATA_DIR_DEFAULT
    target_size: Tuple[int, int] = (128, 128)
    use_synthetic: bool = False
    augment: bool = False
    # Augment at each sample's NATIVE resolution and resize to target as
    # chain step 5 — the reference's ONLY augmentation order
    # (dataset.py:172-193) and therefore the DEFAULT here (round-3 change;
    # previously opt-in).  Applies to --tune trials and --augment training.
    # False = augment the pre-resized cache (opt-in perf mode,
    # --no-native-aug): one fixed shape for the whole augment chain.
    native_aug: bool = True
    # Train-data placement: "hbm" (default) decodes once and keeps the
    # corpus device-resident; "host" keeps the decoded corpus in host RAM
    # and double-buffers batches to HBM per step; "decode" holds only file
    # paths and re-decodes batches on demand in a thread pool (corpora
    # larger than host RAM).  See data/stream.py.
    stream: str = "hbm"


@dataclasses.dataclass
class SiameseTrainConfig:
    """Defaults mirror reference train.py:24-31, 294-296, 330-336."""

    batch_size: int = 4
    num_epochs: int = 50
    learning_rate: float = 0.00010152447097322304
    weight_decay: float = 1.1180726948943663e-05
    # Frozen tuned FocalDiceLoss constants (reference train.py:294).
    focal_alpha: float = 0.6030489822904476
    focal_gamma: float = 1.7930869982898021
    loss_beta: float = 0.6699803915247974
    dice_smooth: float = 1.956571276926647e-06
    optimizer: str = "adamw"
    checkpoint_dir: str = "siamese_checkpoints"
    save_every: int = 5
    # ReduceLROnPlateau (reference train.py:296).
    plateau_factor: float = 0.2
    plateau_patience: int = 7
    # [extension] stop after N consecutive epochs without val-loss
    # improvement (0 = off, reference behavior: always run the full
    # epoch budget).  See train/plateau.EarlyStopping.
    early_stop_patience: int = 0
    n_channels: int = 3
    n_classes: int = 1
    seed: int = 0
    # TPU-specific knobs (not in the reference):
    compute_dtype: str = "bfloat16"  # MXU-friendly; params stay fp32
    data_parallel: bool = True
    resume: bool = False  # resume-from-checkpoint (reference lacks this)
    # Pallas kernel opt-ins (ops/pallas_kernels/).  Numerically identical to
    # the default XLA paths (tests/test_pallas.py in interpret mode, plus
    # compiled-on-TPU checks 2026-08-16: augmented train step with both
    # kernels = 18.36 ms/step vs 18.32 pure-XLA).  OFF by default because
    # XLA's own fusion is already at parity at the reference's 128px
    # workload and the axon tunnel showed occasional instability under
    # Mosaic launches.
    fused_loss: bool = False
    # None = auto: ON for the native-resolution augment path on a real TPU
    # backend (measured 2026-08-20, bs4 native-256²→128² full train step:
    # 87.7 ms/step pure-XLA vs 39.6 ms/step with the fused native-extent
    # photometric kernel — the kernel's opaque call boundary breaks a
    # pathological XLA fusion in the combined aug+fwd/bwd program; the
    # aug-only scans are at parity, 20.9 vs 20.8 ms — and OFF for the
    # fixed-size chain (XLA parity there) and on CPU (interpret mode is
    # for tests, not speed).  True/False force it either way.
    pallas_augment: Optional[bool] = None
    # Run the shared encoder as ONE 2B-batch pass (~15% faster train step;
    # train-mode BN uses joint batch stats over both images — eval forward
    # and the param tree are identical to the reference's two-pass form).
    batched_encoder: bool = False
    # Keep Adam's first-moment accumulator in this dtype (None = param
    # dtype, torch-exact).  "bfloat16" halves one of the three optimizer
    # state tensors' HBM traffic (the update is bandwidth-bound) at the
    # cost of momentum rounding — an opt-in deviation.
    opt_momentum_dtype: Optional[str] = None
    # Run the optimizer update on one concatenated vector (optax.flatten):
    # moment buffers become 2 large arrays instead of ~200 small ones
    # (see train/optim.py).  Same per-element arithmetic; changes the
    # optimizer-state checkpoint layout, so opt-in.
    opt_flat_state: bool = False
    # Average gradients over k mini-steps and apply ONE optimizer update
    # (optax.MultiSteps): emulates batch_size*k beyond HBM capacity.
    # BatchNorm batch stats still update per mini-batch.
    grad_accum: int = 1
    # Keep the best model as a device-HBM snapshot and write
    # best_model.msgpack only on the save_every cadence / at the end,
    # instead of pulling the full fp32 param tree to host on every
    # improving epoch (the reference writes best_model.pth per
    # improvement, train.py:307-313).  Big wall-clock win on slow
    # device links; the file lags the true best by <save_every epochs
    # if training crashes mid-interval, hence opt-in.
    defer_best_ckpt: bool = False
    # Write checkpoints on a background thread: the save takes a device-side
    # snapshot (HBM copies) and the device->host pull + serialize + write
    # overlap the following epochs (checkpoint.AsyncCheckpointWriter).  One
    # save in flight at a time; the pipeline waits for the last write before
    # returning.  Opt-in because a crash between snapshot and write loses
    # that one checkpoint (the synchronous default is durable on return).
    async_ckpt: bool = False
    # Keep decoder skip-concats as slice tuples consumed by kernel-sliced
    # convs (models/blocks.SlicedConv) — no HBM concatenates; numerically
    # equal to the default path up to fp reassociation.
    concat_free: bool = False
    # Rematerialize DoubleConv activations in the backward pass
    # (jax.checkpoint): HBM relief for resolutions/batches beyond capacity
    # at ~1/3 extra conv FLOPs.  Identical math and param tree.
    remat: bool = False
    # Observability (SURVEY.md §5.1-5.2 — absent in the reference):
    profile_dir: Optional[str] = None  # jax.profiler trace output dir
    debug_nans: bool = False  # jax_debug_nans numeric sanitizer
    # Machine-readable run log: one JSON object per event (run_start /
    # epoch / checkpoint / preemption / run_end) appended per line
    # (utils/runlog.py).  --resume appends to the same file.
    log_jsonl: Optional[str] = None


@dataclasses.dataclass
class GANTrainConfig:
    """Defaults mirror reference train_gan.py:26-35."""

    batch_size: int = 1
    num_epochs: int = 200
    learning_rate_g: float = 1e-4
    learning_rate_d: float = 1e-4
    beta1: float = 0.5
    lambda_l1: float = 100.0
    target_size: Tuple[int, int] = (256, 256)
    save_every: int = 10
    sample_every: int = 5
    checkpoint_dir: str = "gan_checkpoints"
    output_dir: str = "gan_samples"
    n_channels: int = 3
    # Architecture knobs, matching the reference's constructor parameters
    # (UNetGenerator(..., num_downs=7, ngf=64), models.py:149;
    # NLayerDiscriminator(..., ndf=64, n_layers=3), models.py:212).  The
    # defaults reproduce the reference models exactly; smaller values
    # train pix2pix at lower resolutions (target must be >= 2**num_downs).
    num_downs: int = 7
    ngf: int = 64
    ndf: int = 64
    n_layers: int = 3
    seed: int = 0
    compute_dtype: str = "bfloat16"
    data_parallel: bool = True
    resume: bool = False
    # One 2B discriminator pass over [real | fake] (~8% faster step); D's
    # BN batch stats then mix real and fake activations — a known GAN
    # behavior change vs the reference's two sequential passes, so opt-in.
    batched_disc: bool = False
    # Feed the discriminator (A, B) as a pair: its first conv runs as a
    # split-kernel sum instead of conv(concat([A, B], channel)) — exact up
    # to fp reassociation, no 6-channel HBM concat (the GAN step's device
    # profile showed ~21% layout copies).  Param tree unchanged.
    concat_free_disc: bool = False
    # Compute the generator forward ONCE per step via jax.vjp and reuse it
    # for both the D-step's detached fake and the G-step's primal+backward.
    # The reference runs G(A) twice with identical params and input
    # (train_gan.py:57, 66) and XLA does not CSE the duplicate (measured:
    # pre-opt 95.8 vs post-opt 94.0 GFLOP; one G fwd is 11.5 G).  Losses
    # and G gradients are the same math (same primal, same cotangents);
    # the second BN running-stat update is reconstructed algebraically
    # (s2 = (1+m)*s1 - m*s0, exact in reals, ~1e-7 float deviation), so
    # this is opt-in rather than default.
    shared_gen_fwd: bool = False
    # Exponential moving average of the generator params (opt-in,
    # standard GAN practice the reference lacks): after every G update,
    # ema <- decay*ema + (1-decay)*params, maintained inside the compiled
    # step.  Saved as generator_ema_epoch_N.msgpack — a regular generator
    # checkpoint, directly consumable by generate_synthetic_data.py via
    # --generator-checkpoint-name.  Typical decay: 0.999.
    ema_decay: Optional[float] = None
    # See SiameseTrainConfig.opt_momentum_dtype / opt_flat_state /
    # async_ckpt.
    opt_momentum_dtype: Optional[str] = None
    opt_flat_state: bool = False
    async_ckpt: bool = False
    profile_dir: Optional[str] = None
    debug_nans: bool = False
    # See SiameseTrainConfig.log_jsonl (utils/runlog.py).
    log_jsonl: Optional[str] = None

    def __post_init__(self):
        # Fail fast: an EMA decay outside [0, 1) silently produces a
        # divergent/meaningless average that still saves as a
        # normal-looking generator checkpoint.
        if self.ema_decay is not None and not (0.0 <= self.ema_decay < 1.0):
            raise ValueError(
                f"ema_decay must be in [0, 1), got {self.ema_decay}"
            )


@dataclasses.dataclass
class EvalConfig:
    """Defaults mirror reference evaluate.py:15-28."""

    batch_size: int = 2
    target_size: Tuple[int, int] = (128, 128)
    checkpoint_path: Optional[str] = None
    output_dir: str = "evaluation_results"
    num_visualizations: int = 5
    n_channels: int = 3
    n_classes: int = 1
    # Extensions the reference README claims but never implements
    # (reference README.md:145-153 Steps 6-7; no cv2/morphology or
    # ensembling code exists there — SURVEY.md §6).
    post_process: bool = False          # morphological opening+closing
    post_process_kernel: int = 3
    ensemble_paths: Optional[Tuple[str, ...]] = None  # avg sigmoid probs
    # Decision threshold for the metrics (reference hardcodes 0.5,
    # evaluate.py:40); threshold_sweep additionally reports macro-F1 over a
    # 0.05..0.95 grid and the best operating point.
    threshold: float = 0.5
    threshold_sweep: bool = False
    # Write the full metrics report (overall + per-city means + sweep) as
    # one JSON file in addition to the printed tables.
    json_out: Optional[str] = None
    # [extension] serve a pre-exported artifact (export_model.py) instead
    # of restoring a checkpoint; with an AOT sidecar (--aot-batch-sizes)
    # the evaluation pays no XLA compile at all (serve.load_serving_fn).
    serving_artifact: Optional[str] = None
    # Sidecar policy for the artifact: "auto" uses a valid .aotc when
    # present, "never" ignores it (on a degraded remote link the
    # executable upload can cost more than the compile it skips —
    # RESULTS.md round-4 headline note), "require" fails without one.
    serving_aot: str = "auto"
    # Model compute dtype for evaluation (bfloat16 matches training's MXU
    # default; float32 for exact-reproducibility comparisons).
    compute_dtype: str = "bfloat16"


@dataclasses.dataclass
class GenerateConfig:
    """Defaults mirror reference generate_synthetic_data.py:13-24."""

    batch_size: int = 4
    target_size: Tuple[int, int] = (256, 256)
    generator_checkpoint_name: str = "generator_epoch_200.msgpack"
    gan_checkpoint_dir: str = "gan_checkpoints"
    synthetic_data_dir: str = SYNTHETIC_DATA_DIR_DEFAULT
    n_channels: int = 3
    # Generator architecture — must match the checkpoint being loaded
    # (see GANTrainConfig.num_downs/ngf).
    num_downs: int = 7
    ngf: int = 64
    # float32 by default: generation is a tiny one-shot inference workload
    # and BASELINE.json asks for bit-comparable PNG outputs vs the
    # reference's fp32 torch path (scripts/check_png_bitparity.py);
    # bfloat16 is available for throughput if ever needed.
    compute_dtype: str = "float32"
    # [extension] serve a pre-exported generator artifact (export_model.py)
    # instead of restoring the checkpoint; with an AOT sidecar the synth
    # stage pays no XLA compile at all (serve.load_serving_fn).
    serving_artifact: Optional[str] = None
    # Sidecar policy: "auto" / "never" / "require" (see EvalConfig).
    serving_aot: str = "auto"


def parse_target_size(value: str) -> Tuple[int, int]:
    """Parse "HxW" target-size strings (reference train.py:263)."""
    h, w = map(int, value.split("x"))
    return (h, w)
