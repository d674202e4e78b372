"""Gabor filter bank generator.

The reference ships a precomputed (25,1,7,7) float32 Gabor bank
(utils/gabor_serre.npy) used as frozen conv0 weights in its ConvLSTM and
ST-LSTM models (reference models/convlstm.py:104-106, ffstlstm.py:29). We
generate an equivalent Serre-style bank analytically: 8 orientations x 3
phases plus a center-surround DoG, 7x7, unit-normalized.
"""

from __future__ import annotations

import numpy as np


def gabor_bank(n_filters: int = 25, size: int = 7, in_channels: int = 1) -> np.ndarray:
    """Returns an HWIO [size, size, in_channels, n_filters] float32 bank."""
    half = size // 2
    yy, xx = np.mgrid[-half:half + 1, -half:half + 1].astype(np.float64)
    filters = []
    n_orient = 8
    lam = size / 2.0  # wavelength
    sigma = 0.56 * lam
    gamma = 0.5
    phases = (0.0, np.pi / 2, np.pi)
    for i in range(n_filters - 1):
        theta = (i % n_orient) * np.pi / n_orient
        psi = phases[(i // n_orient) % len(phases)]
        xr = xx * np.cos(theta) + yy * np.sin(theta)
        yr = -xx * np.sin(theta) + yy * np.cos(theta)
        g = np.exp(-(xr**2 + gamma**2 * yr**2) / (2 * sigma**2)) \
            * np.cos(2 * np.pi * xr / lam + psi)
        g -= g.mean()
        norm = np.linalg.norm(g)
        filters.append(g / (norm if norm > 1e-8 else 1.0))
    # center-surround difference-of-gaussians as the final filter
    dog = np.exp(-(xx**2 + yy**2) / (2 * (0.5 * sigma) ** 2)) \
        - 0.5 * np.exp(-(xx**2 + yy**2) / (2 * sigma**2))
    dog -= dog.mean()
    filters.append(dog / np.linalg.norm(dog))
    bank = np.stack(filters, axis=-1).astype(np.float32)  # [H,W,N]
    bank = bank[:, :, None, :]  # [H,W,1,N]
    if in_channels > 1:
        bank = np.repeat(bank, in_channels, axis=2) / in_channels
    return bank
