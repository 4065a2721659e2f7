"""End-to-end pipeline drivers: the reference's five entry-point main loops,
shared between the CLI scripts and tests.

  run_siamese_training      — reference train.py:258-322 (main)
  run_gan_training          — reference train_gan.py:95-155 (main_gan)
  run_generate_synthetic    — reference generate_synthetic_data.py:33-89
  run_evaluation            — reference evaluate.py:129-210, 287-354
  evaluate_single_pair      — reference evaluate.py:216-283

Behavioral quirks of the reference preserved deliberately (SURVEY.md §7):
  * main training defaults to augment=False (reference train.py:269-276
    never passes augment=True; augmentation runs only under --tune);
  * GAN training scans ALL 14 cities with no train/val split
    (train_gan.py:99-108);
  * evaluation scans ALL cities despite its "validation" naming
    (evaluate.py:315-320);
  * single-pair eval uses BICUBIC + ImageNet normalization, unlike the
    training distribution (evaluate.py:220-224).
"""

from __future__ import annotations

import contextlib
import os
import time
from types import SimpleNamespace
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import checkpoint as ckpt
from .config import (
    DataConfig,
    EvalConfig,
    GANTrainConfig,
    GenerateConfig,
    SiameseTrainConfig,
)
from .data import build_cached_dataset, create_sample_lists
from .data.loader import float_to_uint8
from .metrics import METRIC_KEYS, per_sample_metrics
from .parallel.mesh import make_mesh
from .train import (
    EarlyStopping,
    GANTrainer,
    ReduceLROnPlateau,
    SiameseTrainer,
)
from .train.optim import get_learning_rate, set_learning_rate
from .utils.profiling import StepTimer, enable_nan_checks, trace


def _default_mesh(enabled: bool):
    if enabled and len(jax.devices()) > 1:
        return make_mesh()
    return None


def _setup_observability(trainer, cfg, items_per_step: int, verbose: bool):
    """Attach the per-step timer / NaN sanitizer per config (SURVEY.md
    §5.1-5.2 equivalents; both absent in the reference)."""
    if cfg.debug_nans:
        enable_nan_checks()
        if verbose:
            print("jax_debug_nans enabled (numeric sanitizer).")
    if cfg.profile_dir:
        # Two compiled shapes exist (full batch + trailing partial batch),
        # so the first TWO steps are compile-inflated and excluded.
        trainer.step_timer = StepTimer(
            items_per_step=items_per_step, skip_first=2
        )
    return trace(cfg.profile_dir)


def _report_observability(trainer, cfg, verbose: bool):
    if trainer.step_timer is not None and verbose:
        print(trainer.step_timer.format_summary("Step timing: "))
        print(f"Profiler trace written to {cfg.profile_dir}")


# ---------------------------------------------------------------------------
# Siamese training (reference train.py main)
# ---------------------------------------------------------------------------


def run_siamese_training(
    data_cfg: DataConfig,
    train_cfg: SiameseTrainConfig,
    verbose: bool = True,
) -> Optional[Dict]:
    checkpoint_dir = os.path.join(data_cfg.root_dir, train_cfg.checkpoint_dir)
    os.makedirs(checkpoint_dir, exist_ok=True)

    train_samples = create_sample_lists(
        data_cfg.root_dir, data_cfg.dataset_subdir, data_cfg.synthetic_data_dir,
        mode="train", use_synthetic=data_cfg.use_synthetic, verbose=verbose,
    )
    val_samples = create_sample_lists(
        data_cfg.root_dir, data_cfg.dataset_subdir, data_cfg.synthetic_data_dir,
        mode="val", verbose=verbose,
    )
    if not train_samples:
        print("Error: Training dataset is empty. Check paths and data.")
        return None
    if not val_samples:
        print("Warning: Validation dataset is empty. Check paths and data.")

    native = data_cfg.native_aug and data_cfg.augment
    stream = data_cfg.stream if data_cfg.stream != "hbm" else None
    if native and stream:
        print(
            "--stream has no native-resolution variant (dynamic per-sample "
            "extents need the padded HBM cache); streaming the fixed-size "
            "chain instead."
        )
        native = False
    if stream:
        from .data.stream import StreamingSource

        train_ds = StreamingSource(
            train_samples, data_cfg.target_size, cache=stream,
            verbose=verbose,
        )
    elif native:
        from .data.loader import build_padded_native_dataset

        train_ds = build_padded_native_dataset(train_samples, verbose=verbose)
    else:
        train_ds = build_cached_dataset(
            train_samples, data_cfg.target_size, verbose=verbose
        )
    val_ds = build_cached_dataset(
        val_samples, data_cfg.target_size, verbose=verbose
    )
    if verbose:
        print(
            f"Dataset loaded: {len(train_ds)} train samples, "
            f"{len(val_ds)} val samples."
        )

    mesh = _default_mesh(train_cfg.data_parallel)
    trainer = SiameseTrainer(
        train_cfg, mesh=mesh, augment=data_cfg.augment,
        native_out_size=data_cfg.target_size if native else None,
    )
    rng = jax.random.PRNGKey(train_cfg.seed)
    state = trainer.init_state(rng, data_cfg.target_size)
    scheduler = ReduceLROnPlateau(
        train_cfg.learning_rate, train_cfg.plateau_factor,
        train_cfg.plateau_patience,
    )
    stopper = EarlyStopping(train_cfg.early_stop_patience)
    start_epoch = 1
    best_val_loss = float("inf")

    if train_cfg.resume:
        path = ckpt.find_checkpoint(checkpoint_dir, "last_state")
        if path:
            state, extra = ckpt.restore_checkpoint(path, state, with_extra=True)
            start_epoch = int(extra.get("epoch", 0)) + 1
            best_val_loss = float(extra.get("best_val_loss", float("inf")))
            if "scheduler" in extra:
                scheduler.load_state_dict(
                    jax.tree.map(float, extra["scheduler"])
                )
                state = state.replace(
                    opt_state=set_learning_rate(state.opt_state, scheduler.lr)
                )
            if "early_stop" in extra:
                stopper.load_state_dict(
                    jax.tree.map(float, extra["early_stop"])
                )
            if verbose:
                print(f"Resumed from {path} at epoch {start_epoch}.")

    dev_train = None if stream else trainer._device_arrays(train_ds)
    dev_val = trainer._device_arrays(val_ds) if len(val_ds) else None
    epoch_rng = np.random.RandomState(train_cfg.seed)
    history = {"train_loss": [], "val_loss": []}
    profiler_ctx = _setup_observability(
        trainer, train_cfg, train_cfg.batch_size, verbose
    )
    from .utils.runlog import open_run_log

    runlog = open_run_log(train_cfg.log_jsonl, append=train_cfg.resume)
    if runlog:
        import dataclasses

        runlog.log(
            "run_start", kind="siamese_train", start_epoch=start_epoch,
            n_train=len(train_ds), n_val=len(val_ds),
            data=dataclasses.asdict(data_cfg),
            config=dataclasses.asdict(train_cfg),
        )

    from .utils.signals import GracefulShutdown

    try:
        with profiler_ctx, GracefulShutdown() as stop:
            _run_siamese_epochs(
                trainer, train_cfg, state, scheduler, start_epoch,
                best_val_loss, dev_train, dev_val, train_ds, val_ds,
                epoch_rng, rng, checkpoint_dir, history, verbose, stop,
                runlog, stopper,
            )
        if runlog:
            runlog.log("run_end", best_val_loss=history.get("best_val_loss"))
    finally:
        if runlog:
            runlog.close()
    _report_observability(trainer, train_cfg, verbose)
    if stream:
        train_ds.close()
    if verbose:
        print("Training finished.")
    return history


def _run_siamese_epochs(
    trainer, train_cfg, state, scheduler, start_epoch, best_val_loss,
    dev_train, dev_val, train_ds, val_ds, epoch_rng, rng,
    checkpoint_dir, history, verbose, stop=None, runlog=None, stopper=None,
):
    best_snapshot = None  # device-resident best model (defer_best_ckpt)
    # Background writes (async_ckpt): same call signature as
    # ckpt.save_checkpoint; the device->host pull overlaps later epochs.
    writer = ckpt.AsyncCheckpointWriter() if train_cfg.async_ckpt else None
    save_checkpoint = writer.save if writer else ckpt.save_checkpoint
    for epoch in range(start_epoch, train_cfg.num_epochs + 1):
        lr_now = get_learning_rate(state.opt_state)
        if verbose:
            print(f"\nEpoch {epoch}/{train_cfg.num_epochs} - LR: {lr_now:.1e}")
        t0 = time.perf_counter()
        rng, erng = jax.random.split(rng)
        if dev_train is None:  # streaming path (data/stream.py)
            state, train_loss = trainer.train_epoch_streaming(
                state, train_ds, erng, epoch_rng
            )
        else:
            state, train_loss = trainer.train_epoch(
                state, dev_train, len(train_ds), erng, epoch_rng
            )
        val_loss = (
            trainer.validate(state, dev_val, len(val_ds)) if dev_val else 0.0
        )
        dt = time.perf_counter() - t0
        history["train_loss"].append(train_loss)
        history["val_loss"].append(val_loss)
        if verbose:
            print(
                f"Epoch {epoch} - Train Loss: {train_loss:.4f}, "
                f"Val Loss: {val_loss:.4f} ({dt:.2f}s)"
            )
        if runlog:
            runlog.log(
                "epoch", epoch=epoch, train_loss=train_loss,
                val_loss=val_loss, lr=lr_now, wall_s=round(dt, 3),
            )
        new_lr = scheduler.step(val_loss)
        if new_lr != lr_now:
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, new_lr)
            )
        early_stopped = (
            stopper is not None and dev_val is not None
            and stopper.step(val_loss)
        )
        if val_loss < best_val_loss:
            best_val_loss = val_loss
            if train_cfg.defer_best_ckpt:
                # Keep the best model ON DEVICE (an HBM copy — the live
                # state's buffers are donated into the next epoch's scan)
                # and materialize best_model.msgpack on the save_every
                # cadence / at the end.  Early training improves nearly
                # every epoch, and each host pull is the full fp32 param
                # tree (~165 MB) — on slow device links (the dev tunnel
                # moves ~30 MB/s) those pulls dominate wall clock.
                best_snapshot = {
                    "params": jax.tree.map(jnp.copy, state.params),
                    "batch_stats": jax.tree.map(jnp.copy, state.batch_stats),
                    "extra": {"epoch": epoch, "val_loss": val_loss},
                }
                if verbose:
                    print(
                        f"Best model snapshotted on device (Val Loss: "
                        f"{best_val_loss:.4f})"
                    )
                if runlog:
                    runlog.log("best_snapshot", epoch=epoch,
                               val_loss=val_loss)
            else:
                path = os.path.join(
                    checkpoint_dir, ckpt.checkpoint_name("best_model")
                )
                save_checkpoint(
                    path, state,
                    extra={"epoch": epoch, "val_loss": val_loss},
                    model_only=True,
                )
                if verbose:
                    print(
                        f"Best model saved to {path} (Val Loss: "
                        f"{best_val_loss:.4f})"
                    )
                if runlog:
                    runlog.log("checkpoint", kind="best_model", path=path,
                               epoch=epoch, val_loss=val_loss)
        preempted = stop is not None and stop.requested
        if train_cfg.defer_best_ckpt and best_snapshot is not None and (
            epoch % train_cfg.save_every == 0
            or epoch == train_cfg.num_epochs or preempted or early_stopped
        ):
            path = os.path.join(
                checkpoint_dir, ckpt.checkpoint_name("best_model")
            )
            save_checkpoint(
                path,
                SimpleNamespace(
                    params=best_snapshot["params"],
                    batch_stats=best_snapshot["batch_stats"],
                    opt_state=(), step=0,
                ),
                extra=best_snapshot["extra"], model_only=True,
            )
            best_snapshot = None
            if verbose:
                print(f"Best model saved to {path} (deferred write)")
            if runlog:
                runlog.log("checkpoint", kind="best_model", path=path,
                           epoch=epoch, deferred=True)
        if epoch % train_cfg.save_every == 0:
            path = os.path.join(
                checkpoint_dir, ckpt.checkpoint_name(f"model_epoch_{epoch}")
            )
            save_checkpoint(path, state, extra={"epoch": epoch},
                                 model_only=True)
            if verbose:
                print(f"Checkpoint saved to {path}")
            if runlog:
                runlog.log("checkpoint", kind="model_epoch", path=path,
                           epoch=epoch)
        # Rolling resume state (improvement over the reference).  Saved on
        # the save_every cadence, not every epoch: serializing the full
        # train state (params + optimizer moments, ~0.5 GB) is a
        # device->host pull that would otherwise dominate wall clock on
        # slow links.  Also saved when a preemption signal arrived
        # (utils/signals.py), so --resume continues from THIS epoch.
        if (epoch % train_cfg.save_every == 0
                or epoch == train_cfg.num_epochs or preempted
                or early_stopped):
            last_path = os.path.join(
                checkpoint_dir, ckpt.checkpoint_name("last_state")
            )
            extra = {
                "epoch": epoch,
                "best_val_loss": best_val_loss,
                "scheduler": scheduler.state_dict(),
            }
            if stopper is not None:
                extra["early_stop"] = stopper.state_dict()
            save_checkpoint(last_path, state, extra=extra)
            if runlog:
                runlog.log("checkpoint", kind="last_state", path=last_path,
                           epoch=epoch)
        if preempted:
            if verbose:
                print(
                    f"Preemption requested: resume state saved at epoch "
                    f"{epoch}; relaunch with --resume to continue."
                )
            if runlog:
                runlog.log("preemption", epoch=epoch)
            break
        if early_stopped:
            if verbose:
                print(
                    f"Early stopping at epoch {epoch}: no val-loss "
                    f"improvement in {stopper.patience} epochs (best "
                    f"{best_val_loss:.4f})."
                )
            if runlog:
                runlog.log("early_stop", epoch=epoch,
                           patience=stopper.patience,
                           best_val_loss=best_val_loss)
            break
    if writer is not None:
        writer.wait()  # final write durable (and its errors raised) here
    history["best_val_loss"] = best_val_loss
    history["state"] = state
    history["trainer"] = trainer


# ---------------------------------------------------------------------------
# GAN training (reference train_gan.py main_gan)
# ---------------------------------------------------------------------------


def run_gan_training(
    data_cfg: DataConfig,
    gan_cfg: GANTrainConfig,
    verbose: bool = True,
) -> Optional[Dict]:
    checkpoint_dir = os.path.join(data_cfg.root_dir, gan_cfg.checkpoint_dir)
    output_dir = os.path.join(data_cfg.root_dir, gan_cfg.output_dir)
    os.makedirs(checkpoint_dir, exist_ok=True)
    os.makedirs(output_dir, exist_ok=True)

    # The reference trains the GAN on ALL cities, no split
    # (train_gan.py:99-108) — quirk preserved.
    samples = create_sample_lists(
        data_cfg.root_dir, data_cfg.dataset_subdir, data_cfg.synthetic_data_dir,
        mode="all", verbose=verbose,
    )
    if not samples:
        print("Error: GAN Training dataset is empty. Check dataset path and "
              "structure.")
        return None
    stream = data_cfg.stream if data_cfg.stream != "hbm" else None
    if stream:
        from .data.stream import StreamingSource

        ds = StreamingSource(
            samples, gan_cfg.target_size, cache=stream, verbose=verbose
        )
    else:
        ds = build_cached_dataset(
            samples, gan_cfg.target_size, verbose=verbose
        )
    if verbose:
        print(f"GAN Dataset loaded: {len(ds)} train samples.")

    mesh = _default_mesh(gan_cfg.data_parallel)
    trainer = GANTrainer(gan_cfg, mesh=mesh)
    sg, sd = trainer.init_states(jax.random.PRNGKey(gan_cfg.seed))
    start_epoch = 1
    if gan_cfg.resume:
        pg = ckpt.find_checkpoint(checkpoint_dir, "last_generator")
        pd = ckpt.find_checkpoint(checkpoint_dir, "last_discriminator")
        if pg and pd:
            sg, extra = ckpt.restore_checkpoint(pg, sg, with_extra=True)
            sd = ckpt.restore_checkpoint(pd, sd)
            start_epoch = int(extra.get("epoch", 0)) + 1
            if verbose:
                print(f"Resumed GAN from epoch {start_epoch}.")

    if stream:
        dev = None
    elif mesh is not None:
        from .parallel.mesh import put_dataset_global

        dev = put_dataset_global(mesh, ds.img1, ds.img2)
    else:
        dev = (jax.device_put(ds.img1), jax.device_put(ds.img2))
    epoch_rng = np.random.RandomState(gan_cfg.seed)
    # Fixed preview sample, chosen once: every strip shows the SAME pair so
    # generator progress is comparable across epochs.  (The reference's
    # sample_loader is shuffle=True — train_gan.py:132-134 — so its strips
    # are a different random pair each save; determinism here is a
    # deliberate improvement, seed-derived for reproducibility.)
    preview_i = int(np.random.RandomState(gan_cfg.seed + 1).randint(len(ds)))
    history = {"loss_d": [], "loss_g": []}
    profiler = contextlib.ExitStack()
    profiler.enter_context(
        _setup_observability(trainer, gan_cfg, gan_cfg.batch_size, verbose)
    )
    writer = ckpt.AsyncCheckpointWriter() if gan_cfg.async_ckpt else None
    save_checkpoint = writer.save if writer else ckpt.save_checkpoint
    from .utils.runlog import open_run_log

    runlog = open_run_log(gan_cfg.log_jsonl, append=gan_cfg.resume)
    if runlog:
        import dataclasses

        profiler.callback(runlog.close)
        runlog.log(
            "run_start", kind="gan_train", start_epoch=start_epoch,
            n_train=len(ds), data=dataclasses.asdict(data_cfg),
            config=dataclasses.asdict(gan_cfg),
        )

    from .utils.signals import GracefulShutdown

    stop = profiler.enter_context(GracefulShutdown())
    try:
        for epoch in range(start_epoch, gan_cfg.num_epochs + 1):
            t0 = time.perf_counter()
            if dev is None:  # streaming path (data/stream.py)
                sg, sd, loss_d, loss_g = trainer.train_epoch_streaming(
                    sg, sd, ds, epoch_rng
                )
            else:
                sg, sd, loss_d, loss_g = trainer.train_epoch(
                    sg, sd, dev, len(ds), epoch_rng
                )
            dt = time.perf_counter() - t0
            history["loss_d"].append(loss_d)
            history["loss_g"].append(loss_g)
            if verbose:
                print(
                    f"Epoch {epoch} - Avg Loss D: {loss_d:.4f}, Avg Loss G: "
                    f"{loss_g:.4f} ({dt:.2f}s)"
                )
            if runlog:
                runlog.log("epoch", epoch=epoch, loss_d=loss_d,
                           loss_g=loss_g, wall_s=round(dt, 3))
            if epoch % gan_cfg.sample_every == 0 or epoch == gan_cfg.num_epochs:
                # Sample strip (reference save_samples, train_gan.py:78-92) on
                # the fixed preview pair.
                from .utils.viz import save_gan_sample_strip

                i = preview_i
                if dev is None:
                    p1, p2, _ = ds.batch(np.array([i]))
                    fake = trainer.generate(sg, jax.device_put(p1))
                    strip1, strip2 = p1[0], p2[0]
                else:
                    fake = trainer.generate(sg, dev[0][i:i + 1])
                    strip1, strip2 = ds.img1[i], ds.img2[i]
                path = save_gan_sample_strip(
                    strip1, np.asarray(fake[0]), strip2,
                    ds.cities[i], epoch, output_dir,
                )
                if verbose:
                    print(f"Saved sample image to {path}")
                if runlog:
                    runlog.log("sample", epoch=epoch, path=path)
            preempted = stop.requested
            if (epoch % gan_cfg.save_every == 0 or epoch == gan_cfg.num_epochs
                    or preempted):
                pg = os.path.join(
                    checkpoint_dir,
                    ckpt.checkpoint_name(f"generator_epoch_{epoch}"),
                )
                pd = os.path.join(
                    checkpoint_dir,
                    ckpt.checkpoint_name(f"discriminator_epoch_{epoch}"),
                )
                # Epoch-numbered checkpoints are model-only (the reference
                # saves bare state_dicts, train_gan.py:149-154); the last_*
                # pair keeps optimizer state for resume.
                save_checkpoint(pg, sg, extra={"epoch": epoch},
                                model_only=True)
                save_checkpoint(pd, sd, extra={"epoch": epoch},
                                model_only=True)
                pe = None
                if gan_cfg.ema_decay is not None:
                    # The EMA weights as a REGULAR generator checkpoint
                    # (params=ema, live BN stats) so it drops straight
                    # into generate_synthetic_data.py / evaluate paths.
                    pe = os.path.join(
                        checkpoint_dir,
                        ckpt.checkpoint_name(f"generator_ema_epoch_{epoch}"),
                    )
                    save_checkpoint(
                        pe,
                        sg.replace(params=sg.ema_params, ema_params=None),
                        extra={"epoch": epoch, "ema_decay": gan_cfg.ema_decay},
                        model_only=True,
                    )
                save_checkpoint(
                    os.path.join(
                        checkpoint_dir, ckpt.checkpoint_name("last_generator")
                    ),
                    sg, extra={"epoch": epoch},
                )
                save_checkpoint(
                    os.path.join(
                        checkpoint_dir, ckpt.checkpoint_name("last_discriminator")
                    ),
                    sd, extra={"epoch": epoch},
                )
                if verbose:
                    print(f"GAN Checkpoints saved for epoch {epoch}")
                if runlog:
                    extra_paths = {"ema": pe} if pe else {}
                    runlog.log("checkpoint", kind="gan_epoch", epoch=epoch,
                               generator=pg, discriminator=pd, **extra_paths)
            if preempted:
                if verbose:
                    print(
                        f"Preemption requested: GAN resume state saved at "
                        f"epoch {epoch}; relaunch with --resume to continue."
                    )
                if runlog:
                    runlog.log("preemption", epoch=epoch)
                break
        if writer is not None:
            writer.wait()
        if runlog:
            runlog.log("run_end")
    finally:
        # Exceptions must still restore the signal handlers and stop
        # the profiler (a leaked GracefulShutdown would swallow the
        # process's next ctrl-C).
        profiler.close()
    _report_observability(trainer, gan_cfg, verbose)
    if stream:
        ds.close()
    if verbose:
        print("GAN Training finished.")
    history["state_g"] = sg
    history["state_d"] = sd
    history["trainer"] = trainer
    return history


# ---------------------------------------------------------------------------
# Synthetic-data generation (reference generate_synthetic_data.py)
# ---------------------------------------------------------------------------


def run_generate_synthetic(
    data_cfg: DataConfig,
    gen_cfg: GenerateConfig,
    verbose: bool = True,
) -> int:
    from PIL import Image

    samples = create_sample_lists(
        data_cfg.root_dir, data_cfg.dataset_subdir, data_cfg.synthetic_data_dir,
        mode="all", verbose=verbose,
    )
    if not samples:
        print("Error: Original training dataset is empty. Cannot generate "
              "synthetic data.")
        return 0
    stream = data_cfg.stream if data_cfg.stream != "hbm" else None
    if stream:
        from .data.stream import StreamingSource

        src = StreamingSource(
            samples, gen_cfg.target_size, cache=stream, verbose=verbose
        )
        ds = None
        n_total, cities = len(src), src.cities
    else:
        src = None
        ds = build_cached_dataset(
            samples, gen_cfg.target_size, verbose=verbose
        )
        n_total, cities = len(ds), ds.cities

    if gen_cfg.serving_artifact:
        # [extension] pre-exported artifact path: same [0,1]->[0,1]
        # contract as trainer.generate (serve._inference_fn folds the
        # normalize/denormalize in); with an AOT sidecar the stage runs
        # without any XLA compile.
        from . import serve

        if verbose:
            print(f"Loading serving artifact: {gen_cfg.serving_artifact}")
        if not os.path.exists(gen_cfg.serving_artifact):
            print(f"Error: Serving artifact not found at "
                  f"{gen_cfg.serving_artifact}")
            return 0
        header, serve_fn = serve.load_serving_fn(
            gen_cfg.serving_artifact, aot=gen_cfg.serving_aot
        )
        if verbose and header.get("aot_batch_sizes"):
            print(f"  AOT sidecar batch sizes: {header['aot_batch_sizes']}")
        trainer = sg = None

        def generate(batch):
            return serve_fn(batch)
    else:
        gan_cfg = GANTrainConfig(
            target_size=gen_cfg.target_size, n_channels=gen_cfg.n_channels,
            num_downs=gen_cfg.num_downs, ngf=gen_cfg.ngf,
            compute_dtype=gen_cfg.compute_dtype,
        )
        trainer = GANTrainer(gan_cfg)
        sg, _ = trainer.init_states(jax.random.PRNGKey(0))
        gen_path = os.path.join(
            data_cfg.root_dir, gen_cfg.gan_checkpoint_dir,
            gen_cfg.generator_checkpoint_name,
        )
        if verbose:
            print(f"Loading GAN generator from: {gen_path}")
        if not os.path.exists(gen_path):
            print(f"Error: Generator checkpoint not found at {gen_path}")
            return 0
        sg = ckpt.restore_checkpoint(gen_path, sg)

        def generate(batch):
            return trainer.generate(sg, batch)

    out_base = os.path.join(data_cfg.root_dir, gen_cfg.synthetic_data_dir)
    os.makedirs(os.path.join(out_base, "images"), exist_ok=True)
    os.makedirs(os.path.join(out_base, "labels"), exist_ok=True)

    bs = gen_cfg.batch_size
    dev1 = None if stream else jax.device_put(ds.img1)
    count = 0
    for i in range(0, n_total, bs):
        if stream:
            # Large-corpus path: decode/stage only this batch.
            h1, _, hlb = src.batch(np.arange(i, min(i + bs, n_total)))
            batch = jax.device_put(h1)
        else:
            h1 = hlb = None
            batch = dev1[i:i + bs]
        n_batch = batch.shape[0]
        fake = np.asarray(generate(batch))  # [0,1]
        for j in range(n_batch):
            sample_idx = i + j
            city = cities[sample_idx]
            img_dir = os.path.join(out_base, "images", city)
            lbl_dir = os.path.join(out_base, "labels", city)
            os.makedirs(img_dir, exist_ok=True)
            os.makedirs(lbl_dir, exist_ok=True)
            # img1 saved is the resized copy, img2 is the generator output,
            # label is the real label * 255 (reference
            # generate_synthetic_data.py:70-85).  The reference's img1 went
            # through normalize -> denormalize ((x*2-1)*0.5+0.5) before the
            # truncating byte conversion; that f32 round trip lands a hair
            # BELOW exact integer pixel values, so byte-for-byte parity
            # requires replaying it (scripts/check_png_bitparity.py showed
            # up to 84% of pixels one LSB high without it).
            img1 = (h1[j] if stream else ds.img1[sample_idx]).astype(
                np.float32
            )
            img1 = (img1 * np.float32(2.0) - np.float32(1.0)) * np.float32(
                0.5
            ) + np.float32(0.5)
            Image.fromarray(float_to_uint8(img1)).save(
                os.path.join(img_dir, f"img1_synth_{sample_idx}.png")
            )
            Image.fromarray(float_to_uint8(fake[j])).save(
                os.path.join(img_dir, f"img2_synth_{sample_idx}.png")
            )
            lbl = (
                hlb[j] if stream else ds.labels[sample_idx]
            ).astype(np.uint8) * 255
            Image.fromarray(lbl, mode="L").save(
                os.path.join(lbl_dir, f"cm_synth_{sample_idx}.png")
            )
            count += 1
    if stream:
        src.close()
    if verbose:
        print(
            f"\nSynthetic data generation finished. Saved {count} samples "
            f"to {out_base}"
        )
    return count


# ---------------------------------------------------------------------------
# Evaluation (reference evaluate.py)
# ---------------------------------------------------------------------------


def run_evaluation(
    data_cfg: DataConfig,
    eval_cfg: EvalConfig,
    verbose: bool = True,
) -> Optional[Dict]:
    from .utils.viz import visualize_sample

    output_dir = os.path.join(data_cfg.root_dir, eval_cfg.output_dir)
    os.makedirs(output_dir, exist_ok=True)

    # The reference evaluates ALL cities despite 'validation' naming
    # (evaluate.py:315-320) — quirk preserved.
    samples = create_sample_lists(
        data_cfg.root_dir, data_cfg.dataset_subdir, data_cfg.synthetic_data_dir,
        mode="all", verbose=verbose,
    )
    if not samples:
        print("Error: No validation samples found. Check dataset paths and "
              "structure.")
        return None
    stream = data_cfg.stream if data_cfg.stream != "hbm" else None
    if stream:
        from .data.stream import StreamingSource

        src = StreamingSource(
            samples, eval_cfg.target_size, cache=stream, verbose=verbose
        )
        ds = None
        n_total, cities = len(src), src.cities
    else:
        src = None
        ds = build_cached_dataset(
            samples, eval_cfg.target_size, verbose=verbose
        )
        n_total, cities = len(ds), ds.cities

    # batched_encoder is exactly equivalent in eval mode (running-stat BN;
    # tests/test_models.py) and ~25% faster — safe default for inference.
    train_cfg = SiameseTrainConfig(
        n_channels=eval_cfg.n_channels, n_classes=eval_cfg.n_classes,
        batched_encoder=True, compute_dtype=eval_cfg.compute_dtype,
    )
    trainer = SiameseTrainer(train_cfg)
    # Ensembling (reference README.md:150-153 Step 7, claimed there but
    # never implemented): restore every checkpoint and average sigmoid
    # probabilities across models.
    if eval_cfg.serving_artifact:
        # [extension] pre-exported artifact (export_model.py) instead of a
        # checkpoint: the exported fn is sigmoid(model(img1, img2)) over
        # NORMALIZED inputs; with an AOT sidecar the whole evaluation pays
        # no XLA compile (serve.load_serving_fn).
        from . import serve
        from .data.transforms import normalize as _normalize

        if eval_cfg.ensemble_paths:
            print("Error: --serving-artifact and --ensemble are mutually "
                  "exclusive (export one artifact per model).")
            return None
        if not os.path.exists(eval_cfg.serving_artifact):
            print(f"Error: Serving artifact not found at "
                  f"{eval_cfg.serving_artifact}")
            return None
        header, serve_fn = serve.load_serving_fn(
            eval_cfg.serving_artifact, aot=eval_cfg.serving_aot
        )
        if verbose:
            print(f"Serving artifact: {eval_cfg.serving_artifact} "
                  f"(aot={header.get('aot_batch_sizes', 'none')})")

        def predict_probs(img1, img2):
            return serve_fn(_normalize(img1), _normalize(img2))
    else:
        if eval_cfg.ensemble_paths:
            checkpoint_paths = list(eval_cfg.ensemble_paths)
        else:
            checkpoint_paths = [eval_cfg.checkpoint_path or os.path.join(
                data_cfg.root_dir, "siamese_checkpoints",
                ckpt.checkpoint_name("best_model"),
            )]
        states = []
        for path in checkpoint_paths:
            if not os.path.exists(path):
                print(f"Error: Checkpoint file not found at {path}")
                return None
            base = trainer.init_state(
                jax.random.PRNGKey(0), eval_cfg.target_size
            )
            states.append(ckpt.restore_checkpoint(path, base))
        if verbose and len(states) > 1:
            print(f"Ensembling {len(states)} checkpoints (averaged sigmoid "
                  f"probabilities).")

        def predict_probs(img1, img2):
            prob_sum = trainer.predict(states[0], img1, img2)
            for s in states[1:]:
                prob_sum = prob_sum + trainer.predict(s, img1, img2)
            return prob_sum / len(states)

    dev = None if stream else trainer._device_arrays(ds)
    bs = eval_cfg.batch_size
    total = {k: 0.0 for k in METRIC_KEYS}
    per_city: Dict[str, Dict[str, float]] = {}
    per_city_counts: Dict[str, int] = {}
    n = 0
    visualized = 0
    # [extension] operating-point sweep: macro-F1/IoU per threshold over a
    # grid, one vmapped program per batch (metrics.per_sample_metrics_sweep).
    sweep_grid = (
        np.round(np.arange(0.05, 0.951, 0.05), 2)
        if eval_cfg.threshold_sweep else None
    )
    sweep_f1 = sweep_iou = None
    if sweep_grid is not None:
        from .metrics import per_sample_metrics_sweep

        sweep_f1 = np.zeros(len(sweep_grid))
        sweep_iou = np.zeros(len(sweep_grid))
    for start in range(0, n_total, bs):
        idx = np.arange(start, min(start + bs, n_total))
        if stream:
            # Large-corpus path: only this batch is staged to HBM.
            h1, h2, labels = src.batch(idx)
            img1, img2 = jax.device_put(h1), jax.device_put(h2)
        else:
            h1 = h2 = None
            img1 = dev[0][idx[0]:idx[-1] + 1]
            img2 = dev[1][idx[0]:idx[-1] + 1]
            labels = ds.labels[idx[0]:idx[-1] + 1]
        probs = np.asarray(predict_probs(img1, img2))[..., 0]
        if eval_cfg.post_process:
            # Morphological opening+closing (reference README.md:145-148
            # Step 6, implemented here — ops/morphology.py). Output is a
            # {0,1} mask; downstream 0.5-threshold metrics are unchanged
            # in form.
            from .ops.morphology import postprocess_prediction

            probs = np.asarray(postprocess_prediction(
                jax.numpy.asarray(probs),
                kernel_size=eval_cfg.post_process_kernel,
            ))
        labels_f = labels.astype(np.float32)
        batch_metrics = jax.device_get(
            per_sample_metrics(probs, labels_f, eval_cfg.threshold)
        )
        if sweep_grid is not None:
            sm = jax.device_get(per_sample_metrics_sweep(
                jnp.asarray(probs), jnp.asarray(labels_f),
                jnp.asarray(sweep_grid, jnp.float32),
            ))
            sweep_f1 += np.asarray(sm["f1"]).sum(axis=1)
            sweep_iou += np.asarray(sm["iou"]).sum(axis=1)
        for k_in_batch, sample_i in enumerate(idx):
            city = cities[sample_i]
            if city not in per_city:
                per_city[city] = {k: 0.0 for k in METRIC_KEYS}
                per_city_counts[city] = 0
            for key in METRIC_KEYS:
                v = float(batch_metrics[key][k_in_batch])
                per_city[city][key] += v
                total[key] += v
            per_city_counts[city] += 1
            n += 1
            if visualized < eval_cfg.num_visualizations:
                visualize_sample(
                    h1[k_in_batch] if stream else ds.img1[sample_i],
                    h2[k_in_batch] if stream else ds.img2[sample_i],
                    labels[k_in_batch], probs[k_in_batch],
                    city, visualized, output_dir,
                )
                visualized += 1

    if stream:
        src.close()
    overall = {k: v / n for k, v in total.items()} if n else {}
    sweep = None
    if sweep_grid is not None and n:
        best = int(np.argmax(sweep_f1))
        sweep = {
            "thresholds": sweep_grid.tolist(),
            "f1": (sweep_f1 / n).tolist(),
            "iou": (sweep_iou / n).tolist(),
            "best_threshold": float(sweep_grid[best]),
            "best_f1": float(sweep_f1[best] / n),
        }
        import json

        with open(os.path.join(output_dir, "threshold_sweep.json"), "w") as f:
            json.dump(sweep, f, indent=1)
    if verbose:
        print("\n--- Overall Evaluation Metrics ---")
        for k, v in overall.items():
            print(f"{k.capitalize()}: {v:.4f}")
        if sweep is not None:
            print("\n--- Threshold sweep (macro F1 / IoU) ---")
            for th, f1v, iouv in zip(
                sweep["thresholds"], sweep["f1"], sweep["iou"]
            ):
                mark = "  <- best" if th == sweep["best_threshold"] else ""
                print(f"  t={th:.2f}  F1={f1v:.4f}  IoU={iouv:.4f}{mark}")
            print(
                f"Best operating point: t={sweep['best_threshold']:.2f} "
                f"(F1={sweep['best_f1']:.4f})"
            )
        print("\n--- Per-City Evaluation Metrics ---")
        for city, m in per_city.items():
            c = per_city_counts[city]
            print(f"City: {city} (Samples: {c})")
            for k in METRIC_KEYS:
                print(f"  {k.capitalize()}: {m[k] / c:.4f}")
    if eval_cfg.json_out:
        # Machine-readable report mirroring the printed tables (per-city
        # values are the per-sample macro means, like the printout).
        import json

        report = {
            "n_samples": n,
            "threshold": eval_cfg.threshold,
            "checkpoints": ([eval_cfg.serving_artifact]
                            if eval_cfg.serving_artifact
                            else checkpoint_paths),
            "post_process": eval_cfg.post_process,
            "overall": overall,
            "per_city": {
                city: {k: m[k] / per_city_counts[city] for k in METRIC_KEYS}
                for city, m in per_city.items()
            },
            "per_city_counts": per_city_counts,
            "sweep": sweep,
        }
        parent = os.path.dirname(os.path.abspath(eval_cfg.json_out))
        os.makedirs(parent, exist_ok=True)
        with open(eval_cfg.json_out, "w") as f:
            json.dump(report, f, indent=1)
        if verbose:
            print(f"Metrics report written to {eval_cfg.json_out}")
    return {"overall": overall, "per_city": per_city,
            "per_city_counts": per_city_counts, "sweep": sweep}


def evaluate_single_pair(
    data_cfg: DataConfig,
    eval_cfg: EvalConfig,
    img1_path: str,
    img2_path: str,
    city_name: str,
    label_path: Optional[str] = None,
    verbose: bool = True,
) -> Optional[Dict]:
    """Single-pair evaluation (reference evaluate.py:216-283).

    Quirk preserved: BICUBIC resize + ImageNet mean/std normalization —
    a DIFFERENT input distribution from training's [-1,1] (documented
    inconsistency, SURVEY.md §2 #23)."""
    from PIL import Image

    from .metrics import calculate_metrics
    from .utils.viz import visualize_sample

    output_dir = os.path.join(data_cfg.root_dir, eval_cfg.output_dir)
    os.makedirs(output_dir, exist_ok=True)
    target = eval_cfg.target_size
    try:
        img1 = Image.open(img1_path).convert("RGB")
        img2 = Image.open(img2_path).convert("RGB")
    except FileNotFoundError:
        print(f"Error: One or both image paths not found: {img1_path}, "
              f"{img2_path}")
        return None
    # PIL BICUBIC (T.Resize on a PIL image), then ImageNet normalize.
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def prep(im):
        im = im.resize((target[1], target[0]), Image.BICUBIC)
        arr = np.asarray(im, np.float32) / 255.0
        return (arr - mean) / std

    x1 = prep(img1)[None]
    x2 = prep(img2)[None]

    label = None
    if label_path:
        try:
            lp = Image.open(label_path).convert("L")
            lp = lp.resize((target[1], target[0]), Image.NEAREST)
            label = (np.asarray(lp, np.float32) / 255.0)[None]
        except FileNotFoundError:
            print(f"Warning: Label path not found: {label_path}. Proceeding "
                  f"without metrics.")
            label_path = None

    train_cfg = SiameseTrainConfig(
        n_channels=eval_cfg.n_channels, n_classes=eval_cfg.n_classes,
        batched_encoder=True, compute_dtype=eval_cfg.compute_dtype,
    )
    trainer = SiameseTrainer(train_cfg)
    if eval_cfg.ensemble_paths:
        checkpoint_paths = list(eval_cfg.ensemble_paths)
    else:
        checkpoint_paths = [eval_cfg.checkpoint_path or os.path.join(
            data_cfg.root_dir, "siamese_checkpoints",
            ckpt.checkpoint_name("best_model"),
        )]
    states = []
    for path in checkpoint_paths:
        if not os.path.exists(path):
            print(f"Error: Checkpoint not found at {path}. Cannot "
                  f"evaluate single pair.")
            return None
        base = trainer.init_state(jax.random.PRNGKey(0), target)
        states.append(ckpt.restore_checkpoint(path, base))

    # The reference's transform already normalized, so apply the raw model
    # (predict() would re-normalize): mirror by calling apply directly.
    import jax.numpy as jnp

    prob_sum = None
    for state in states:
        logits = trainer.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(x1), jnp.asarray(x2), train=False,
        )
        p = jax.nn.sigmoid(logits)
        prob_sum = p if prob_sum is None else prob_sum + p
    probs = np.asarray(prob_sum / len(states))[..., 0]
    if eval_cfg.post_process:
        from .ops.morphology import postprocess_prediction

        probs = np.asarray(postprocess_prediction(
            jnp.asarray(probs), kernel_size=eval_cfg.post_process_kernel,
        ))

    visualize_sample(
        np.clip(x1[0], 0, 1), np.clip(x2[0], 0, 1),
        label[0] if label is not None else None,
        probs[0], city_name, "single_eval", output_dir,
    )
    result = {"pred": probs}
    if label is not None and label_path:
        m = jax.device_get(calculate_metrics(probs, label))
        m = {k: float(v) for k, v in m.items()}
        if verbose:
            print(f"\n--- Metrics for {city_name} ---")
            for k, v in m.items():
                print(f"{k.capitalize()}: {v:.4f}")
        result["metrics"] = m
    elif not label_path and verbose:
        print("No label path provided, skipping metrics calculation.")
    return result
