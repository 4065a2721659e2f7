"""Checkpointing with the reference's file-naming contract + resume.

The reference saves bare ``model.state_dict()`` as ``best_model.pth`` /
``model_epoch_N.pth`` / ``generator_epoch_N.pth`` / ``discriminator_epoch_N
.pth`` and cannot resume training (optimizer/epoch state is never saved;
SURVEY.md §5.3-5.4).  Here:

  * same base names, ``.msgpack`` extension (Flax serialization format);
  * checkpoints carry params + batch_stats + opt_state + step so training
    CAN resume (an improvement over the reference, flagged as such);
  * model-only restore works for inference (extra keys ignored);
  * writes are atomic (tmp file + rename) so an interrupted save never
    corrupts the previous checkpoint — the failure-tolerance analog of the
    reference's try/except around torch.save (train.py:310-321).

Design note (why flax msgpack rather than Orbax): the reference's contract
is one flat FILE per checkpoint with a meaningful stem (best_model,
model_epoch_N, generator_epoch_N... — train.py:307-321, train_gan.py:149-154,
loaded by name at generate_synthetic_data.py:18 and evaluate.py:20).  Orbax
manages step-numbered DIRECTORIES behind a CheckpointManager, which breaks
that file-naming contract; at these sizes (~0.5 GB max) synchronous
single-file msgpack writes are sub-second, so Orbax's async machinery buys
nothing.  Multi-host runs save on process 0 only (params are replicated).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_state_dict(state) -> Dict[str, Any]:
    d = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if getattr(state, "ema_params", None) is not None:
        d["ema_params"] = state.ema_params
    return d


def bulk_device_get(tree, max_workers: int = 8):
    """device_get a pytree with concurrent per-leaf transfers.

    Measured on a 380-leaf / 494 MB Siamese train state through the dev
    tunnel: sequential jax.device_get = 260 s (~2 MB/s — each leaf pays
    the link round trip plus a device-side relayout), a single device-side
    concat = 182 s first call (dominated by compiling the 380-operand
    concatenate), while 8 threads of per-leaf np.asarray overlap those
    costs and finish in 30 s with no extra compilation.  Host/numpy leaves
    pass through untouched; returns a tree of numpy arrays (same
    shapes/dtypes as jax.device_get — see tests/test_checkpoint_bulk.py)."""
    from concurrent.futures import ThreadPoolExecutor

    leaves, treedef = jax.tree.flatten(tree)
    idxs = [i for i, l in enumerate(leaves) if isinstance(l, jax.Array)]
    out = list(leaves)
    if idxs:
        with ThreadPoolExecutor(
            max_workers=min(max_workers, len(idxs))
        ) as ex:
            pulled = list(ex.map(np.asarray, (leaves[i] for i in idxs)))
        for i, arr in zip(idxs, pulled):
            out[i] = arr
    return jax.tree.unflatten(treedef, out)


def save_checkpoint(path: str, state, extra: Optional[Dict[str, Any]] = None,
                    model_only: bool = False) -> None:
    """Serialize a TrainState (params/batch_stats/opt_state/step) + extras.

    model_only=True drops optimizer state and step — the reference's
    best_model/model_epoch_N/.pth contract is a bare model state_dict
    (train.py:311,318), and it is 3x smaller to pull from device; resume
    uses the full last_state checkpoint."""
    payload = _to_state_dict(state)
    if model_only:
        payload = {"params": payload["params"],
                   "batch_stats": payload["batch_stats"]}
    # Concurrent device->host transfer: sequential jax.device_get on this
    # ~380-leaf tree measured 260 s (~2 MB/s) through the dev tunnel;
    # bulk_device_get's 8-thread per-leaf pulls overlap the per-transfer
    # round trips and relayouts and take 30 s for the same 494 MB state.
    payload = bulk_device_get(payload)
    if extra:
        payload["extra"] = extra
    data = serialization.to_bytes(payload)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    try:
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        # A crash/kill between write and rename leaves a stale .tmp; never
        # let it accumulate (the rename above makes success remove it too).
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


class AsyncCheckpointWriter:
    """Background checkpoint writes: snapshot on device, pull + serialize +
    write on a worker thread while training continues.

    The live train state's buffers are DONATED into the next step/epoch
    program, so a deferred host pull would read freed memory; ``save``
    therefore first takes a device-side copy of the payload (cheap HBM
    copies, dispatched without sync) and hands only that snapshot to the
    worker.  One save is in flight at a time — a second ``save`` waits for
    the first, bounding the extra HBM to one snapshot — and write errors
    surface on the next ``save``/``wait`` (the failure-tolerance analog of
    the reference's try/except around torch.save, train.py:310-321).

    Motivation is slow device links: through the dev TPU tunnel a full
    train-state pull is ~20-30 s (see bulk_device_get); synchronous saves
    put that on the training wall clock, async saves overlap it with the
    next epochs.  On fast PCIe hosts both are sub-second."""

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor

        self._ex = ThreadPoolExecutor(max_workers=1)
        self._inflight = None

    def save(self, path: str, state, extra: Optional[Dict[str, Any]] = None,
             model_only: bool = False) -> None:
        import jax.numpy as jnp

        self.wait()
        payload = _to_state_dict(state)
        if model_only:
            payload = {"params": payload["params"],
                       "batch_stats": payload["batch_stats"]}
        snap = jax.tree.map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x,
            payload,
        )
        self._inflight = self._ex.submit(self._write, path, snap, extra)

    @staticmethod
    def _write(path: str, snap, extra) -> None:
        payload = bulk_device_get(snap)
        if extra:
            payload["extra"] = extra
        data = serialization.to_bytes(payload)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        tmp = path + ".tmp"
        try:
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                try:
                    os.remove(tmp)
                except OSError:
                    pass

    def wait(self) -> None:
        """Block until the in-flight write (if any) finishes; re-raises its
        exception.  Call once after the training loop so the final
        checkpoint is durable before the process exits."""
        if self._inflight is not None:
            fut, self._inflight = self._inflight, None
            fut.result()


def restore_checkpoint(path: str, state, with_extra: bool = False):
    """Restore into a template TrainState (built by the trainer's
    init_state). Returns the restored state (and extras if requested).

    The state fields are restored via from_state_dict against the template
    (shape/structure-checked); ``extra`` is free-form and taken raw from the
    msgpack payload (an empty-dict template would silently DROP it).

    A ``.pth`` path loads a reference torch state_dict via the interop
    converter (model weights only — torch checkpoints never carry
    optimizer state; SURVEY.md §5.4)."""
    if path.endswith(".pth"):
        from gan_aug_pfa_tpu import interop

        payload = interop.variables_from_torch_file(path)
    else:
        with open(path, "rb") as f:
            data = f.read()
        payload = serialization.msgpack_restore(data)
    template = _to_state_dict(state)
    restored = {
        k: (serialization.from_state_dict(template[k], payload[k], name=k)
            if k in payload else template[k])  # model-only checkpoints
        for k in template
    }
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    if "ema_params" in template:
        # EMA enabled for this run: resume it from the checkpoint, or —
        # when resuming a pre-EMA checkpoint — seed it from the restored
        # params so the average starts at the current weights.
        ema = (restored["ema_params"] if "ema_params" in payload
               else jax.tree.map(np.copy, restored["params"]))
        new_state = new_state.replace(ema_params=ema)
    if with_extra:
        return new_state, payload.get("extra", {})
    return new_state


def restore_model_only(path: str, variables: Dict[str, Any]
                       ) -> Dict[str, Any]:
    """Restore just {params, batch_stats} into a model-variables template —
    the inference-load path (reference evaluate.py:345,
    generate_synthetic_data.py:48).  ``.pth`` paths go through the torch
    interop converter."""
    template = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }
    if path.endswith(".pth"):
        from gan_aug_pfa_tpu import interop

        payload = interop.variables_from_torch_file(path)
    else:
        with open(path, "rb") as f:
            data = f.read()
        # Tolerate full train-state checkpoints: deserialize leniently by
        # matching only the keys we need.
        payload = serialization.msgpack_restore(data)
    out = {}
    for key in ("params", "batch_stats"):
        out[key] = serialization.from_state_dict(template[key], payload[key])
    return out


def checkpoint_name(base: str) -> str:
    """Map the reference's .pth naming to ours (same stems)."""
    return base + ".msgpack"


def find_checkpoint(directory: str, stem: str) -> Optional[str]:
    """Locate ``<stem>.msgpack`` (or a reference-trained ``<stem>.pth``,
    loadable via the interop converter) in a directory, None if absent."""
    for ext in (".msgpack", ".pth"):
        p = os.path.join(directory, stem + ext)
        if os.path.exists(p):
            return p
    return None
