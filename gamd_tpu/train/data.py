"""Datasets reading the reference's .npz layouts.

Two formats (reference: /root/reference/code/train_utils.py):

  * per-frame files data_{seed}_{t}.npz with keys pos/vel/forces, 10 seeds x
    1000 frames, deterministic 90/10 split from a seed-0 numpy shuffle
    (train_utils.py:36-43). TIP4P frames contain a virtual M site every 4th
    atom which the loader drops from pos and forces (train_utils.py:58-64).
  * one big npz with pos/force/box/atom_type/train_idx/test_idx for the RPBE
    DFT data (train_utils.py:117-163), optional use_part -> first 1500
    training frames.

Frames of one system all share N, so batches stack to dense [B, N, 3]
arrays — no ragged collation. An optional pack cache concatenates the
thousands of tiny npz files into one .npy blob for fast epoch iteration.
"""

import os
from typing import Iterator, Optional

import numpy as np


def reference_split(n_total: int, train_fraction: float = 0.9):
    """The reference's exact split: np.random.seed(0) shuffle of arange
    (train_utils.py:36-43)."""
    idxs = np.arange(n_total)
    rng = np.random.RandomState(0)
    rng.shuffle(idxs)
    n_train = int(n_total * train_fraction)
    return idxs[:n_train], idxs[n_train:]


def _drop_m_sites(arr):
    """Remove every 4th row (TIP4P virtual site; train_utils.py:58-64)."""
    return arr[np.mod(np.arange(arr.shape[0]), 4) < 3]


class TrajectoryDataset:
    """data_{seed}_{t}.npz trajectory frames (LJ / TIP3P / TIP4P)."""

    def __init__(self, dataset_path, sample_num=1000, seed_num=10,
                 mode="train", data_type="lj", case_prefix="data_",
                 split=(0.9, 0.1), pack_cache: Optional[str] = None,
                 extra_seed_num=0):
        """extra_seed_num: trajectories beyond the canonical seed_num
        (files data_{seed_num}_{t}.npz ...) appended to the TRAIN set only.
        The reference 90/10 split over the first seed_num*sample_num frames
        is untouched, so the held-out eval set stays byte-identical to the
        10-seed protocol while training sees more data."""
        assert mode in ("train", "test")
        self.dataset_path = dataset_path
        self.sample_num = sample_num
        self.seed_num = seed_num
        self.extra_seed_num = extra_seed_num
        self.data_type = data_type
        self.case_prefix = case_prefix
        train_idx, test_idx = reference_split(seed_num * sample_num, split[0])
        if mode == "train" and extra_seed_num:
            extra = np.arange(seed_num * sample_num,
                              (seed_num + extra_seed_num) * sample_num)
            train_idx = np.concatenate([train_idx, extra])
        self.idx = train_idx if mode == "train" else test_idx

        self._packed = None
        if pack_cache is not None:
            self._packed = self._load_or_build_pack(pack_cache)

        if data_type in ("tip3p", "tip4p"):
            # One-hot O=1/H=0 node feature from the O,H,H pattern
            # (train_utils.py:24-30).
            n = self.n_atoms
            self.particle_type_one_hot = (
                (np.arange(n) % 3 == 0).astype(np.float32).reshape(-1, 1))
        else:
            self.particle_type_one_hot = None

    @property
    def n_atoms(self):
        sample = self._read_raw(0)
        return sample["pos"].shape[0]

    def __len__(self):
        return len(self.idx)

    def _fname(self, flat_idx):
        seed = flat_idx // self.sample_num
        t = flat_idx % self.sample_num
        return os.path.join(self.dataset_path,
                            f"{self.case_prefix}{seed}_{t}.npz")

    def _read_raw(self, flat_idx):
        if self._packed is not None:
            pos, forces = self._packed
            return {"pos": pos[flat_idx], "forces": forces[flat_idx]}
        with np.load(self._fname(flat_idx)) as raw:
            pos = raw["pos"].astype(np.float32)
            forces = raw["forces"].astype(np.float32)
        if self.data_type == "tip4p":
            pos = _drop_m_sites(pos)
            forces = _drop_m_sites(forces)
        return {"pos": pos, "forces": forces}

    def _load_or_build_pack(self, cache_path):
        """Concatenate all frames into one blob (host-side IO optimization;
        the reference re-opens thousands of npz files per epoch through
        torch DataLoader workers). Uses the native multithreaded packer
        (csrc/gamd_io.cpp) when the toolchain is available."""
        total_seeds = self.seed_num + self.extra_seed_num
        if os.path.exists(cache_path):
            with np.load(cache_path, mmap_mode="r") as z:
                pos, forces = z["pos"], z["forces"]
            if pos.shape[0] != total_seeds * self.sample_num:
                raise ValueError(
                    f"pack cache {cache_path} holds {pos.shape[0]} frames "
                    f"but the dataset spans {total_seeds * self.sample_num} "
                    f"(seed_num={self.seed_num}, extra={self.extra_seed_num})"
                    " — delete the stale cache or use a distinct cache path")
            return pos, forces

        from gamd_tpu.train import native_io
        drop_m = self.data_type == "tip4p"
        pos = forces = None
        if native_io.available():
            probe = self._read_raw(0)
            n_atoms = probe["pos"].shape[0]
            try:
                pos, forces = native_io.pack_trajectory(
                    self.dataset_path, total_seeds, self.sample_num,
                    n_atoms, drop_m_site=drop_m, prefix=self.case_prefix)
            except RuntimeError as e:
                # The csrc packer reads the STORED/v1.0 npz subset only;
                # compressed or exotic archives fall back to numpy.
                print(f"native packer failed ({e}); numpy fallback")
        if pos is None:
            all_pos, all_forces = [], []
            for flat in range(total_seeds * self.sample_num):
                frame = self._read_raw(flat)
                all_pos.append(frame["pos"])
                all_forces.append(frame["forces"])
            pos = np.stack(all_pos)
            forces = np.stack(all_forces)
        np.savez(cache_path, pos=pos, forces=forces)
        return pos, forces

    def subtract_from_labels(self, offset_fn, chunk: int = 128):
        """Subtract ``offset_fn([B, N, 3] pos) -> [B, N, 3]`` (dataset force
        units) from every force label, IN MEMORY only — the on-disk pack
        cache keeps the raw labels so other runs are unaffected.

        Used by the analytic long-range channel (``--longrange``): the GNN
        trains on the short-range residual; GNNForceField adds the analytic
        k-space term back at deployment (physics/ewald.py recip_energy).
        Requires the pack cache (per-frame lazy reads would recompute the
        offset every epoch)."""
        if self._packed is None:
            raise ValueError("subtract_from_labels requires the packed "
                             "dataset cache (drop --no_pack)")
        pos, forces = self._packed
        pos = np.asarray(pos)
        forces = np.array(forces, copy=True)
        for i in range(0, pos.shape[0], chunk):
            forces[i:i + chunk] -= np.asarray(offset_fn(pos[i:i + chunk]))
        self._packed = (pos, forces)

    def __getitem__(self, i):
        frame = self._read_raw(int(self.idx[i]))
        if self.particle_type_one_hot is not None:
            frame["feat"] = self.particle_type_one_hot
        return frame


class RealLargeDataset:
    """RPBE/DFT single-npz dataset with per-frame boxes
    (train_utils.py:117-163)."""

    def __init__(self, dataset_path, mode="train", use_part=False):
        assert mode in ("train", "test")
        with np.load(dataset_path, allow_pickle=True) as z:
            train_idx = z["train_idx"]
            test_idx = z["test_idx"]
            self.pos = z["pos"]
            self.forces = z["force"]
            self.box_size = z["box"]
            self.atom_type = z["atom_type"]
        if mode == "train":
            self.idx = train_idx[:1500] if use_part else train_idx
        else:
            self.idx = test_idx

    def __len__(self):
        return len(self.idx)

    def __getitem__(self, i):
        j = self.idx[i]
        atom_type = np.asarray(self.atom_type[j]).reshape(-1)
        feat = (atom_type == 1).astype(np.float32).reshape(-1, 1)
        return {
            "pos": self.pos[j].astype(np.float32),
            "forces": self.forces[j].astype(np.float32),
            "feat": feat,
            "box_size": np.asarray(self.box_size[j], np.float32),
        }


def batch_iterator(dataset, batch_size, shuffle=True, seed=0,
                   drop_last=True) -> Iterator[dict]:
    """Stack frames into dense [B, N, ...] numpy batches."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    end = len(order) - (len(order) % batch_size) if drop_last else len(order)
    for start in range(0, end, batch_size):
        items = [dataset[int(i)] for i in order[start:start + batch_size]]
        batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
        yield batch
