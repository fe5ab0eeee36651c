"""Host-side data loader: shuffle, batch, collate, prefetch.

Replaces torch DataLoader workers (num_workers=31 in the reference configs,
SURVEY.md §2.8) with a single background prefetch thread. The per-sample
work here is trivially cheap (numpy slicing + a 3x3 rotation); the expensive
preprocessing is done once at dataset build time, so one producer thread
keeps a TPU step loop fed. Batches are optionally device_put with
batch-axis sharding so host→HBM transfer overlaps compute.
"""

import queue
import threading
from typing import Callable, Dict, Iterator, Optional, Sequence

import numpy as np


class Dataset:
    """Minimal map-style dataset protocol: __len__ + sample(idx, rng)."""

    def __len__(self) -> int:  # pragma: no cover - protocol
        raise NotImplementedError

    def sample(self, idx: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        raise NotImplementedError  # pragma: no cover - protocol


def _is_canonical_collate(collate_fn, dataset) -> bool:
    """Explicit identity contract (no code-object sniffing): the fast path
    is taken only for the canonical padded collates themselves, or
    ``functools.partial`` wrappers of them whose bound ``num_entities`` (if
    any) matches the dataset's own. Anything else — including a lambda that
    merely *calls* a canonical collate, whose wrapping semantics we cannot
    see — routes through the per-sample path; opt in explicitly with
    ``fast_path=True``."""
    import functools as _ft

    from lam_slide_tpu.data import collate as _collate_mod

    canonical = (
        _collate_mod.pad_collate_temporal,
        _collate_mod.pad_collate_temporal_v2,
    )
    fn, bound_ne = collate_fn, None
    while isinstance(fn, _ft.partial):
        # Keep the OUTERMOST binding: partial call semantics merge
        # {**inner.keywords, **call_kwargs}, so an outer partial's keyword
        # overrides an inner one at call time.
        if bound_ne is None and "num_entities" in fn.keywords:
            bound_ne = fn.keywords["num_entities"]
        fn = fn.func
    if not any(fn is c for c in canonical):
        return False
    ds_ne = getattr(dataset, "num_entities", None)
    return bound_ne is None or ds_ne is None or bound_ne == ds_ne


class Loader:
    # Multi-host default, set once by the entry point after
    # jax.distributed.initialize() (train/cli.py --multihost); every Loader
    # built afterwards feeds its process's slice of each global batch.
    default_process_shard: Optional[tuple] = None

    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        collate_fn: Callable[[Sequence[Dict[str, np.ndarray]]], Dict[str, np.ndarray]],
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
        transform: Optional[Callable] = None,
        fast_path: Optional[bool] = None,
        process_shard: Optional[tuple] = None,
    ):
        """process_shard=(index, count): multi-host data feeding — every
        process draws the SAME shuffled global order (same seed) and keeps
        the contiguous per-process slice of each batch, so the concatenation
        over processes is exactly the single-process batch (matching the
        data-axis layout shard_batch assembles via
        make_array_from_process_local_data). batch_size stays GLOBAL.
        Augmentation RNG streams differ per process (each draws only its
        slice) — distributionally identical, not bit-reproducible across
        different process counts."""
        # full_batch_feed: multi-host fallback for loaders that can't be
        # process-sharded (ragged final batch, non-divisible batch size).
        # Every host draws identical full batches (same seed/order) and
        # shard_batch slices out each host's addressable rows
        # (make_array_from_process_local_data with explicit global_shape).
        # Correct but without the per-host IO saving of true sharding —
        # which is why train loaders should use drop_last=True under
        # --multihost.
        self.full_batch_feed = False
        ambient = process_shard is None
        if ambient:
            process_shard = type(self).default_process_shard
        if process_shard is not None:
            pi, pc = process_shard
            if not 0 <= pi < pc:
                raise ValueError(f"bad process_shard {process_shard}")
            shardable = drop_last and batch_size % pc == 0
            if not shardable:
                if not ambient:
                    raise ValueError(
                        "process_shard requires drop_last=True and a "
                        "process-divisible batch_size (a ragged or uneven "
                        "batch would desynchronize hosts); drop "
                        "process_shard to use replicated full-batch feeding")
                process_shard = None
                self.full_batch_feed = True
        self.process_shard = process_shard
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.transform = transform
        self.fast_path = fast_path
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self, rng: np.random.Generator):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(order)
        n_batches = len(self)
        for i in range(n_batches):
            idx = order[i * self.batch_size : (i + 1) * self.batch_size]
            if self.process_shard is not None:
                pi, pc = self.process_shard
                local = self.batch_size // pc
                idx = idx[pi * local : (pi + 1) * local]
            yield idx

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        epoch = self._epoch
        self._epoch += 1
        rng = np.random.default_rng((self.seed, epoch))

        # Datasets may provide a whole-batch fast path (sample_batch: gather +
        # pad + augment + mask in a few array ops / native engine calls, see
        # data/batch_assembly.py) — semantically equal to sample()+collate
        # for the CANONICAL padded collates, pinned by tests; RNG streams
        # differ, so a given seed draws different (equally distributed)
        # augmentations on the two paths. Custom collate_fns disable it
        # unless fast_path=True is passed explicitly.
        batched = getattr(self.dataset, "sample_batch", None)
        if batched is not None and self.fast_path is not True:
            if self.fast_path is False or not _is_canonical_collate(
                    self.collate_fn, self.dataset):
                batched = None

        def produce(out_q: queue.Queue):
            try:
                for idx_batch in self._batch_indices(rng):
                    if batched is not None:
                        batch = batched(idx_batch, rng)
                    else:
                        samples = [self.dataset.sample(int(i), rng) for i in idx_batch]
                        batch = self.collate_fn(samples)
                    if self.transform is not None:
                        batch = self.transform(batch)
                    out_q.put(batch)
            except BaseException as e:  # surface worker errors in the consumer
                out_q.put(e)
            finally:
                out_q.put(None)

        q: queue.Queue = queue.Queue(maxsize=max(self.prefetch, 1))
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
