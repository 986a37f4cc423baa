"""Overlay / visualization helpers (host, cv2).

Behavioural parity: misc/viz_utils.py:28-125 (contour overlays with
per-type colours, optional centroid dots) and the jet-colormap panels of
run_desc.py:201-256.
"""

from __future__ import annotations

import colorsys
import random

import cv2
import numpy as np


def random_colors(n, bright=True, shuffle=True):
    brightness = 1.0 if bright else 0.7
    hsv = [(i / max(n, 1), 1, brightness) for i in range(n)]
    colors = [colorsys.hsv_to_rgb(*c) for c in hsv]
    if shuffle:
        random.shuffle(colors)
    return colors


def overlay_instances(image, inst_info, draw_dot=False, type_colour=None,
                      line_thickness=2):
    """Draw instance contours (from an inst_info dict) on an RGB image.

    type_colour: {type_id: (name, (r, g, b))} like type_info.json.
    """
    overlay = np.copy(image)
    rng_colors = (np.array(random_colors(len(inst_info))) * 255).astype(np.uint8)
    for idx, (inst_id, info) in enumerate(inst_info.items()):
        contour = np.asarray(info["contour"], np.int32)
        if info.get("type") is not None and type_colour is not None:
            colour = tuple(int(c) for c in type_colour[info["type"]][1])
        else:
            colour = tuple(int(c) for c in rng_colors[idx])
        cv2.drawContours(overlay, [contour], -1, colour, line_thickness)
        if draw_dot:
            cx, cy = (int(v) for v in info["centroid"])
            overlay = cv2.circle(overlay, (cx, cy), 3, (255, 0, 0), -1)
    return overlay


def colorize(ch, vmin, vmax):
    """Jet colormap of a scalar map, clamped to [vmin, vmax]."""
    import matplotlib.pyplot as plt

    cmap = plt.get_cmap("jet")
    ch = np.squeeze(ch.astype("float32")).copy()
    ch = np.clip(ch, vmin, vmax)
    ch = (ch - vmin) / (vmax - vmin + 1.0e-16)
    return (cmap(ch)[..., :3] * 255).astype("uint8")


def viz_train_panel(imgs, true_np, pred_np, true_hv, pred_hv,
                    true_tp=None, pred_tp=None, nr_types=None):
    """True-vs-pred comparison panel per sample (run_desc.py:201-256)."""
    rows = []
    for i in range(imgs.shape[0]):
        h, w = true_np[i].shape[:2]
        img = imgs[i]
        y0 = (img.shape[0] - h) // 2
        x0 = (img.shape[1] - w) // 2
        img = img[y0 : y0 + h, x0 : x0 + w].astype(np.uint8)
        true_row = [img, colorize(true_np[i], 0, 1),
                    colorize(true_hv[i][..., 0], -1, 1),
                    colorize(true_hv[i][..., 1], -1, 1)]
        pred_row = [img, colorize(pred_np[i], 0, 1),
                    colorize(pred_hv[i][..., 0], -1, 1),
                    colorize(pred_hv[i][..., 1], -1, 1)]
        if nr_types is not None and true_tp is not None:
            true_row.append(colorize(true_tp[i], 0, nr_types))
            pred_row.append(colorize(pred_tp[i], 0, nr_types))
        rows.append(np.concatenate(
            [np.concatenate(true_row, axis=1), np.concatenate(pred_row, axis=1)],
            axis=0,
        ))
    return np.concatenate(rows, axis=0)
