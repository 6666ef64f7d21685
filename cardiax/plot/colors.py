"""Colormaps + value->RGB mapping for activation maps
(reference modules/plot/plot_3D_activation_map.py:18-59)."""

from __future__ import annotations

import numpy as np


def get_cmap(name: str = "blue_red"):
    """Custom colormaps: 'blue_red' and 'green_yellow_red'
    (reference plot_3D_activation_map.py:18-30)."""
    from matplotlib.colors import LinearSegmentedColormap
    if name == "blue_red":
        return LinearSegmentedColormap.from_list("blue_red",
                                                 [(0, 0, 1), (1, 0, 0)])
    if name == "green_yellow_red":
        return LinearSegmentedColormap.from_list(
            "green_yellow_red", [(0, 0.8, 0), (1, 1, 0), (1, 0, 0)])
    import matplotlib.pyplot as plt
    return plt.get_cmap(name)


def map_values_to_rgb(values: np.ndarray, vmin: float | None = None,
                      vmax: float | None = None,
                      cmap_name: str = "green_yellow_red") -> np.ndarray:
    """Normalize values and map through the cmap -> (N, 3) RGB
    (reference plot_3D_activation_map.py:45-59)."""
    values = np.asarray(values, float)
    vmin = float(values.min()) if vmin is None else vmin
    vmax = float(values.max()) if vmax is None else vmax
    denom = max(vmax - vmin, 1e-9)
    normed = np.clip((values - vmin) / denom, 0.0, 1.0)
    cmap = get_cmap(cmap_name)
    return np.asarray(cmap(normed))[..., :3]
