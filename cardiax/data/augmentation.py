"""Key-aware affine augmentation of slice dicts (host-side, numpy).

Capability parity with reference modules/data/augmentation/{__init__,affine}.py:
a grid of pixel translations (np.roll, +-<=10px) x in-plane rotations (multiples
of 360/126 deg) applied consistently across modalities:

  * image masks:       rotated with the native C++ engine (cardiax/native;
                       scipy.ndimage fallback), translated with np.roll;
  * displacement X/Y:  channels rotated as a vector field (component mixing);
  * strain matrix:     rotation == np.roll along the sector axis (the 126
                       sectors tile the angular direction);
  * TOS curve:         same sector roll; translations leave strain/TOS alone.

The reference's `augment_all_data` reads its knobs from
``data_config['loading']`` — a published bug (its main.py passes the keys at
top level). We read from the top level, which is the intended behavior
(SURVEY.md section 0.4).
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List

import numpy as np

N_SECTORS_DEFAULT = 126

# keys understood as image-plane arrays (H, W, T) or (H, W)
_IMAGE_KEYS = (
    "cine_lv_myo_masks",
    "cine_lv_myo_masks_interpolated",
    "myo_masks",
    "source_img",
    "target_img",
)
# displacement-field component pairs, rolled/rotated together
_DISP_PAIRS = (("displacement_field_X", "displacement_field_Y"),)
# sector-axis arrays: rotate => circular roll along sectors
_SECTOR_KEYS_2D = ("strain_matrix", "strain_mat")   # (n_sectors, T)
_SECTOR_KEYS_1D = ("TOS", "sector_LMA_labels")       # (n_sectors,)


def translate(datum: Dict[str, Any], shift_y: int, shift_x: int) -> Dict[str, Any]:
    """np.roll pixel translation of image-plane arrays; strain/TOS untouched
    (reference affine.py:38-43, 60-72)."""
    out = copy.deepcopy(datum)
    for key in _IMAGE_KEYS:
        if key in out and isinstance(out[key], np.ndarray):
            out[key] = np.roll(out[key], (shift_y, shift_x), axis=(0, 1))
    for kx, ky in _DISP_PAIRS:
        for k in (kx, ky):
            if k in out and isinstance(out[k], np.ndarray):
                out[k] = np.roll(out[k], (shift_y, shift_x), axis=(0, 1))
    return out


def rotate(datum: Dict[str, Any], angle_deg: float,
           n_sectors: int = N_SECTORS_DEFAULT) -> Dict[str, Any]:
    """In-plane rotation by ``angle_deg`` (a multiple of 360/n_sectors).

    Image arrays rotate about their center (nearest-neighbour for binary
    masks); sector-axis arrays circularly roll by angle/(360/n_sectors)
    sectors (reference affine.py:24-37, 73-79).
    """
    from cardiax.native import rotate_stack
    out = copy.deepcopy(datum)
    for key in _IMAGE_KEYS:
        if key in out and isinstance(out[key], np.ndarray):
            arr = out[key]
            rot = rotate_stack(arr, angle_deg, order=0)
            out[key] = rot.astype(arr.dtype)
    # displacement fields: rotate the sampling grid AND the vector components
    for kx, ky in _DISP_PAIRS:
        if kx in out and ky in out and isinstance(out[kx], np.ndarray):
            dx, dy = out[kx], out[ky]
            rx = rotate_stack(dx, angle_deg, order=1)
            ry = rotate_stack(dy, angle_deg, order=1)
            th = np.deg2rad(angle_deg)
            c, s = np.cos(th), np.sin(th)
            out[kx] = (c * rx - s * ry).astype(dx.dtype)
            out[ky] = (s * rx + c * ry).astype(dy.dtype)
    n_roll = int(round(angle_deg / (360.0 / n_sectors)))
    for key in _SECTOR_KEYS_2D:
        if key in out and isinstance(out[key], np.ndarray):
            out[key] = np.roll(out[key], n_roll, axis=0)
    for key in _SECTOR_KEYS_1D:
        if key in out and isinstance(out[key], np.ndarray):
            out[key] = np.roll(out[key], n_roll, axis=0)
    return out


def augment_datum(datum: Dict[str, Any], data_config: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Grid of translations x rotations for one slice dict
    (reference augmentation/__init__.py:5-68)."""
    ty = int(data_config.get("augment_translate_times_y", 0))
    tx = int(data_config.get("augment_translate_times_x", 0))
    rot_times = int(data_config.get("augment_rotate_times", 0))
    rot_interval = int(data_config.get("augment_rotate_interval", 10))
    n_sectors = int(data_config.get("n_sectors", N_SECTORS_DEFAULT))
    sector_deg = 360.0 / n_sectors

    max_shift = 10
    shifts_y = list(np.linspace(-max_shift, max_shift, 2 * ty + 1).astype(int)) if ty > 0 else [0]
    shifts_x = list(np.linspace(-max_shift, max_shift, 2 * tx + 1).astype(int)) if tx > 0 else [0]
    angles = [sector_deg * rot_interval * k for k in range(1, rot_times + 1)] if rot_times > 0 else []

    augmented: List[Dict[str, Any]] = []
    for sy in shifts_y:
        for sx in shifts_x:
            if sy == 0 and sx == 0:
                base = datum
            else:
                base = translate(datum, sy, sx)
                tagged = copy.copy(base)
                tagged["augmented"] = True
                augmented.append(tagged)
            for ang in angles:
                rot = rotate(base, ang, n_sectors)
                rot["augmented"] = True
                augmented.append(rot)
    return augmented


def augment_all_data(slices_data_list: List[Dict[str, Any]],
                     data_config: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Augment every slice that has the needed modalities; skip incomplete
    slices (reference augmentation/__init__.py:71-102)."""
    if (data_config.get("augment_translate_times_y", 0) == 0
            and data_config.get("augment_translate_times_x", 0) == 0
            and data_config.get("augment_rotate_times", 0) == 0):
        return []
    out: List[Dict[str, Any]] = []
    for datum in slices_data_list:
        out.extend(augment_datum(datum, data_config))
    return out
