"""Streaming data path: train on corpora larger than device HBM.

The default path decodes the whole corpus once and keeps it HBM-resident
(data/loader.py) — right for OSCD's ~tens of samples, impossible once the
corpus outgrows HBM (this framework targets production-scale synthetic
corpora: generate_synthetic_data.py can emit thousands of triplets per
city).  The reference's answer to scale was DataLoader worker processes
re-decoding PNGs every epoch (reference dataset.py:218-237, train.py:289);
the TPU-native answer here is a staged pipeline that keeps the chip busy:

  * ``StreamingSource`` holds the decoded corpus in HOST RAM
    (``cache="host"``: decode each file exactly once, like the HBM cache
    but one level down the memory hierarchy) or nothing at all
    (``cache="decode"``: re-decode each batch on demand in a thread pool —
    the C++ PNG decoder releases the GIL, so decode parallelism is real).
  * ``prefetch_batches`` stays ``depth`` batches ahead: batch assembly
    (host gather or decode) runs in worker threads, and ``jax.device_put``
    is dispatched early so the H2D copy overlaps the previous step's
    compute.  At most ``depth`` batches are in flight on the device at a
    time, so HBM holds O(depth) batches, never the corpus.  With a mesh,
    batches land already sharded over the 'data' axis (each chip receives
    only its slice).
  * The trainer consumes batches with the same compiled step body as the
    resident path minus the gather (train/siamese.py
    ``_train_step_batch``), so the two paths are numerically identical
    (tests/test_stream.py).

Use ``--stream host`` when the corpus fits host RAM but not HBM; use
``--stream decode`` when it fits neither.  The resident default remains
the fastest for small corpora (zero per-step host work).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .loader import build_cached_dataset, load_sample_arrays
from .scanner import Sample

Batch = Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]


class StreamingSource:
    """Batch source over a sample list at a fixed target size.

    cache="host"  : decode every sample once into host-RAM arrays.
    cache="decode": hold only file paths; decode batches on demand.

    Samples should come from the scanner (data/scanner.py), which has
    already verified every file readable (the reference's scan-time
    contract, dataset.py:285-295); unlike the cache builders there is no
    second skip-at-build pass here — in decode mode an unreadable file
    surfaces as a RuntimeError naming it at batch-assembly time (a
    skipped sample would shift batch shapes mid-epoch).
    """

    def __init__(
        self,
        samples: List[Sample],
        target_size: Tuple[int, int],
        cache: str = "host",
        workers: int = 8,
        verbose: bool = True,
    ):
        if cache not in ("host", "decode"):
            raise ValueError(
                f"StreamingSource cache must be 'host' or 'decode', "
                f"got {cache!r}"
            )
        self.cache = cache
        self.target_size = tuple(target_size)
        # Two pools: batch-level staging tasks (submit) must never share
        # a pool with the per-sample decodes they fan out to, or staging
        # tasks occupy every worker and deadlock waiting for decodes.
        self._decode_pool = ThreadPoolExecutor(max_workers=max(1, workers))
        self._staging_pool = ThreadPoolExecutor(max_workers=4)
        if cache == "host":
            ds = build_cached_dataset(samples, self.target_size,
                                      verbose=False)
            self._host = ds
            self._samples = []
            self.cities = ds.cities
            self._n = len(ds)
            self._has_labels = ds.labels is not None
            if verbose:
                print(
                    f"Streaming source: {self._n} samples cached in host "
                    f"RAM ({ds.img1.nbytes * 2 / 1e6:.1f} MB of image "
                    "data), batches staged to HBM per step."
                )
        else:
            self._samples = list(samples)
            self._host = None
            self.cities = [s.city for s in self._samples]
            self._n = len(self._samples)
            self._has_labels = all(
                s.label is not None for s in self._samples
            )
            if verbose:
                print(
                    f"Streaming source: {self._n} samples decoded on "
                    f"demand ({max(1, workers)} decode threads), batches "
                    "staged to HBM per step."
                )

    def __len__(self) -> int:
        return self._n

    @property
    def has_labels(self) -> bool:
        return self._has_labels

    def _decode_one(self, i: int):
        s = self._samples[i]
        try:
            return load_sample_arrays(s, self.target_size)
        except Exception as e:
            raise RuntimeError(
                f"Streaming decode failed for city {s.city} "
                f"({s.img1}): {e!r}. Streaming cannot skip samples "
                "mid-epoch; remove or fix the file (the scanner's "
                "readability pass normally catches this)."
            ) from e

    def batch(self, idx: np.ndarray) -> Batch:
        """Assemble one (img1, img2, labels) numpy batch for `idx`."""
        if self._host is not None:
            ds = self._host
            lbl = ds.labels[idx] if ds.labels is not None else None
            return ds.img1[idx], ds.img2[idx], lbl
        triplets = list(
            self._decode_pool.map(self._decode_one, [int(i) for i in idx])
        )
        img1 = np.stack([t[0] for t in triplets])
        img2 = np.stack([t[1] for t in triplets])
        labels = (
            np.stack([t[2] for t in triplets]) if self._has_labels else None
        )
        return img1, img2, labels

    def submit(self, idx: np.ndarray):
        """Assemble a batch on a staging thread; returns a Future."""
        return self._staging_pool.submit(self.batch, idx)

    def close(self) -> None:
        self._staging_pool.shutdown(wait=False)
        self._decode_pool.shutdown(wait=False)


def prefetch_batches(
    source: StreamingSource,
    batch_indices: Sequence[np.ndarray],
    put_fn,
    depth: int = 2,
) -> Iterator[Tuple[np.ndarray, object]]:
    """Yield (idx, device_batch) staying at most `depth` batches ahead.

    Batch assembly runs on the source's staging threads; `put_fn` (a
    jax.device_put wrapper, possibly sharding over the mesh 'data' axis)
    is called as soon as the host batch is ready, so the H2D transfer is
    dispatched before the consumer asks for the batch — JAX dispatch is
    async, letting the copy ride under the previous step's compute.

    `depth` bounds BOTH queues: at most `depth` host batches are being
    assembled and at most `depth` device batches are staged in HBM.  The
    consumer's pace therefore limits device memory to O(depth) batches —
    never the corpus (that is the whole point of streaming).
    """
    depth = max(1, depth)
    pending = []  # (idx, future) — FIFO, assembly in flight
    staged = []   # (idx, device_batch) — H2D dispatched
    it = iter(batch_indices)

    def fill():
        while len(pending) + len(staged) < depth:
            try:
                idx = next(it)
            except StopIteration:
                return
            pending.append((idx, source.submit(idx)))

    fill()
    while pending or staged:
        # Stage completed assemblies (dispatch their H2D now), up to the
        # depth bound; always stage at least one so the loop progresses.
        while pending and (
            len(staged) == 0
            or (len(staged) < depth and pending[0][1].done())
        ):
            idx, fut = pending.pop(0)
            staged.append((idx, put_fn(fut.result())))
        yield staged.pop(0)
        fill()
