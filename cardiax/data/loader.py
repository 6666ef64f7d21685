"""Batching: fixed-shape numpy batches ready for device_put under a sharding.

TPU-first re-design of the reference's torch DataLoader usage
(joint_registration_strainmat_LMA.py:99-101) and its slice-grouping
SliceDataLoader + custom_collate_fn (slice_dataloader.py:18-104):

  * every batch has the SAME shape — the final partial batch is padded up to
    ``batch_size`` and a ``sample_mask`` (1 real / 0 pad) rides along, so the
    jitted train step compiles exactly once;
  * string/metadata fields are collated into Python lists and kept host-side
    (never shipped to device);
  * `SliceBatcher` groups ALL items of a slice into one batch (pair-per-item
    registration datasets), padding the pair axis to a static maximum — the
    XLA-friendly analog of the reference's variable-length slice batches.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Sequence

import numpy as np


def epoch_permutation(seed: int, epoch: int, n: int) -> np.ndarray:
    """The shuffle order of epoch ``epoch`` for a loader seeded ``seed``.

    Epoch-INDEXED, not sequential: the permutation is a pure function of
    (seed, epoch), so a run resumed at epoch k replays exactly the
    uninterrupted run's epoch-k..N shuffle stream (torch's
    ``DistributedSampler.set_epoch`` idea). A sequential RNG would restart
    from the epoch-0 stream on resume, making resumed-equals-uninterrupted
    impossible to certify (VERDICT r3 #3)."""
    return np.random.default_rng(
        np.random.SeedSequence([int(seed) & 0xFFFFFFFF, int(epoch)])
    ).permutation(n)


def collate(items: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack array fields; keep non-arrays as lists (reference
    slice_dataloader.py:18-45 collate semantics, minus torch)."""
    batch: Dict[str, Any] = {}
    keys = items[0].keys()
    for k in keys:
        v0 = items[0][k]
        if isinstance(v0, np.ndarray):
            batch[k] = np.stack([np.asarray(it[k]) for it in items], axis=0)
        else:
            batch[k] = [it[k] for it in items]
    return batch


def _pad_batch(batch: Dict[str, Any], n_real: int, batch_size: int) -> Dict[str, Any]:
    if n_real == batch_size:
        batch["sample_mask"] = np.ones((batch_size,), np.float32)
        return batch
    out: Dict[str, Any] = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            pad = np.repeat(v[-1:], batch_size - n_real, axis=0)
            out[k] = np.concatenate([v, pad], axis=0)
        else:
            out[k] = list(v) + [v[-1]] * (batch_size - n_real)
    out["sample_mask"] = np.concatenate(
        [np.ones((n_real,), np.float32), np.zeros((batch_size - n_real,), np.float32)])
    return out


class Batcher:
    """Shuffling, fixed-shape batch iterator over a dataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, pad_final: bool = True, drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.pad_final = pad_final
        self.drop_last = drop_last
        self.seed = int(seed)
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle stream to a given epoch (resume support)."""
        self._epoch = int(epoch)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = epoch_permutation(self.seed, self._epoch, n)
        self._epoch += 1
        bs = self.batch_size
        for start in range(0, n, bs):
            idx = order[start:start + bs]
            if len(idx) < bs and self.drop_last:
                return
            items = [self.dataset[int(i)] for i in idx]
            batch = collate(items)
            if self.pad_final:
                batch = _pad_batch(batch, len(idx), bs)
            else:
                batch["sample_mask"] = np.ones((len(idx),), np.float32)
            yield batch


class SliceBatcher:
    """Whole-slice batching for pairwise registration datasets.

    Each dataset item is one (src, tar) frame pair; a *slice* owns a variable
    number of pairs. The reference's SliceDataLoader flattens all pairs of the
    batched slices into one ragged batch; here the pair axis is padded to
    ``max_pairs_per_slice`` with a ``pair_mask``, giving the single static
    shape (n_slices, max_pairs, ...) the jitted program requires.
    """

    def __init__(self, dataset, slices_per_batch: int, max_pairs_per_slice: int,
                 shuffle: bool = False, seed: int = 0):
        self.dataset = dataset
        self.slices_per_batch = int(slices_per_batch)
        self.max_pairs = int(max_pairs_per_slice)
        self.shuffle = shuffle
        self.seed = int(seed)
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def __len__(self) -> int:
        ns = self.dataset.get_n_slices()
        return (ns + self.slices_per_batch - 1) // self.slices_per_batch

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        ns = self.dataset.get_n_slices()
        order = epoch_permutation(self.seed, self._epoch, ns) \
            if self.shuffle else np.arange(ns)
        self._epoch += 1
        for start in range(0, ns, self.slices_per_batch):
            slice_ids = order[start:start + self.slices_per_batch]
            n_real_slices = len(slice_ids)
            # pad the slice axis by repeating the last slice
            while len(slice_ids) < self.slices_per_batch:
                slice_ids = np.concatenate([slice_ids, slice_ids[-1:]])
            per_slice = [self.dataset.get_slice(int(s)) for s in slice_ids]
            batch: Dict[str, Any] = {}
            first = per_slice[0][0]
            for k, v0 in first.items():
                if isinstance(v0, np.ndarray):
                    padded = []
                    for items in per_slice:
                        arrs = [np.asarray(it[k]) for it in items[: self.max_pairs]]
                        while len(arrs) < self.max_pairs:
                            arrs.append(np.zeros_like(arrs[-1]))
                        padded.append(np.stack(arrs, axis=0))
                    batch[k] = np.stack(padded, axis=0)   # (S, P, ...)
                else:
                    batch[k] = [[it[k] for it in items] for items in per_slice]
            pair_mask = np.zeros((self.slices_per_batch, self.max_pairs), np.float32)
            for si, items in enumerate(per_slice):
                pair_mask[si, : min(len(items), self.max_pairs)] = 1.0
            slice_mask = np.zeros((self.slices_per_batch,), np.float32)
            slice_mask[:n_real_slices] = 1.0
            batch["pair_mask"] = pair_mask
            batch["sample_mask"] = slice_mask
            yield batch


class DeviceBatcher:
    """Device-resident dataset cache: upload the STACKED dataset once, gather
    every batch on-device by (shuffled) indices.

    Batch semantics are exactly ``Batcher``'s for the same seed — identical
    permutation stream, final batch padded by repeating the last item,
    ``sample_mask`` marking the pads — so the two are interchangeable
    step-for-step (test-pinned). Items must be epoch-invariant, which every
    cardiax dataset guarantees (reference-semantics augmentation expands the
    data at LOAD time; ``__getitem__`` is deterministic).

    Why: the per-step host->device batch transfer dominates real training
    wall time whenever the interconnect is slow relative to the step (a
    tunneled TPU: 16 ms compute vs ~hundreds of ms transfer — see STATUS.md
    round 3). With the dataset in HBM, only a (batch_size,) int32 index
    vector crosses per step. Gated by the ``training.device_data_cache``
    config (auto: on when the stacked arrays fit the byte budget).
    """

    device_resident = True

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, mesh=None, epoch: int = 0):
        import jax
        import jax.numpy as jnp

        n = len(dataset)
        if n == 0:
            raise ValueError("DeviceBatcher over an empty dataset")
        host = collate([dataset[i] for i in range(n)])
        self._meta = {k: v for k, v in host.items()
                      if not isinstance(v, np.ndarray)}
        arrays = {k: v for k, v in host.items() if isinstance(v, np.ndarray)}
        self.n = n
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        # same (seed, epoch)-indexed stream as Batcher: hand over a host
        # loader's seed + epoch counter and the streams stay aligned
        self.seed = int(seed)
        self._epoch = int(epoch)
        self.mesh = mesh

        if mesh is not None:
            from cardiax.parallel.mesh import (batch_sharding,
                                               replicate_sharding)
            rep = replicate_sharding(mesh)
            self._data = {k: jax.device_put(v, rep) for k, v in arrays.items()}
            # mirror shard_batch's rule: batch-shard only when the leading
            # dim divides the mesh product, else replicate — the train step
            # then sees exactly the layouts the host path produces
            n_shard = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
            div = self.batch_size % n_shard == 0

            def sh(ndim):
                return batch_sharding(mesh, ndim) if div                     else replicate_sharding(mesh)
            out_sh = {k: sh(v.ndim) for k, v in arrays.items()}
            out_sh["sample_mask"] = sh(1)
            self._out_sh = out_sh      # fused-epoch path mirrors these
            self._gather = jax.jit(self._gather_fn, out_shardings=out_sh)
        else:
            self._data = {k: jnp.asarray(v) for k, v in arrays.items()}
            self._out_sh = None
            self._gather = jax.jit(self._gather_fn)

    @staticmethod
    def _gather_fn(data, idx, mask):
        import jax.numpy as jnp
        out = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
        out["sample_mask"] = mask
        return out

    def nbytes(self) -> int:
        return sum(int(np.prod(v.shape)) * v.dtype.itemsize
                   for v in self._data.values())

    def __len__(self) -> int:
        return (self.n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def epoch_plan(self):
        """The CURRENT epoch's full batch schedule as ``(idx, mask)``
        matrices of shape (n_steps, batch_size) — the fused-epoch trainer's
        one-upload-per-epoch feed (``TrainerEngine`` ``epoch_fuse``).
        Consumes the epoch exactly like ``__iter__`` (same permutation
        stream, same repeat-last final-batch padding, advances the epoch
        counter), so the two feeds are interchangeable step-for-step."""
        n, bs = self.n, self.batch_size
        order = epoch_permutation(self.seed, self._epoch, n) \
            if self.shuffle else np.arange(n)
        self._epoch += 1
        idx_rows, mask_rows = [], []
        for start in range(0, n, bs):
            idx = order[start:start + bs]
            n_real = len(idx)
            if n_real < bs:                     # _pad_batch: repeat last item
                idx = np.concatenate(
                    [idx, np.repeat(idx[-1:], bs - n_real)])
            mask = np.zeros((bs,), np.float32)
            mask[:n_real] = 1.0
            idx_rows.append(idx.astype(np.int32))
            mask_rows.append(mask)
        return np.stack(idx_rows), np.stack(mask_rows)

    def __iter__(self):
        idx_mat, mask_mat = self.epoch_plan()   # advances the epoch counter
        for idx, mask in zip(idx_mat, mask_mat):
            batch = dict(self._gather(self._data, idx, mask))
            for k, v in self._meta.items():     # host-side metadata lists
                batch[k] = [v[int(i)] for i in idx]
            yield batch
