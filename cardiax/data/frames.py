"""Frame-axis alignment: the static-shape policy of the whole framework.

XLA compiles one program per shape, so every array that reaches the device is
padded/cropped along its frame axis to a compile-time constant T here, on the
host (capability parity with reference modules/data/datareader/DENSE_IO_utils.py:2-46,
which every dataset ctor routes through).
"""

from __future__ import annotations

import numpy as np


def align_n_frames_to(arr: np.ndarray, n_frames: int, frame_axis: int = -1,
                      pad_mode: str = "edge") -> np.ndarray:
    """Crop to the first ``n_frames`` or pad along ``frame_axis``.

    Default pad mode is ``edge`` (repeat the last frame), matching the
    reference's canonical alignment semantics.
    """
    arr = np.asarray(arr)
    t = arr.shape[frame_axis]
    if t == n_frames:
        return arr
    if t > n_frames:
        idx = [slice(None)] * arr.ndim
        idx[frame_axis] = slice(0, n_frames)
        return arr[tuple(idx)]
    pad = [(0, 0)] * arr.ndim
    axis = frame_axis % arr.ndim
    pad[axis] = (0, n_frames - t)
    return np.pad(arr, pad, mode=pad_mode)
