"""Anchor inspection tool (reference: tools/anchor_vis.py).

Reads the `anchors_map.bin` / `anchors.bin` exports (and optionally the SA
mask) of a view and renders anchor sets. Works headless: `--point x,y` dumps
one pixel's anchors to stdout / an overlay PNG; `--interactive` opens the
click-to-inspect matplotlib UI when a display is available.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional, Tuple

import numpy as np

from ..config import ANCHOR_NUM
from ..io.binmat import read_bin_mat
from ..io.images import read_image_color, write_image


def read_anchors(anchors_path) -> np.ndarray:
    """anchors.bin: int32 weak_count, int32 anchor_num, int16 (x, y) pairs."""
    with open(anchors_path, "rb") as f:
        weak_count, anchor_num = np.fromfile(f, np.int32, 2)
        data = np.fromfile(f, np.int16, weak_count * anchor_num * 2)
    return data.reshape(weak_count, anchor_num, 2)


def anchors_of_pixel(anchors_map: np.ndarray, anchors: np.ndarray,
                     x: int, y: int) -> Optional[np.ndarray]:
    idx = int(anchors_map[y, x])
    if idx < 0:
        return None
    return anchors[idx]


def render_overlay(image: np.ndarray, anchor_set: np.ndarray,
                   point: Tuple[int, int], radius: int = 2) -> np.ndarray:
    out = image.copy()

    def mark(x, y, color):
        y0, y1 = max(0, y - radius), min(out.shape[0], y + radius + 1)
        x0, x1 = max(0, x - radius), min(out.shape[1], x + radius + 1)
        out[y0:y1, x0:x1] = color

    mark(point[0], point[1], (0, 0, 255))
    for k in range(1, anchor_set.shape[0]):
        ax, ay = int(anchor_set[k, 0]), int(anchor_set[k, 1])
        if ax < 0 or ay < 0:
            continue
        mark(ax, ay, (0, 255, 0))
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--result_folder", required=True,
                   help="<scan>/APD/<view> folder with anchors exports")
    p.add_argument("--image", default=None, help="background image")
    p.add_argument("--point", default=None, help="x,y pixel to inspect")
    p.add_argument("--out", default=None, help="overlay PNG output path")
    p.add_argument("--interactive", action="store_true")
    args = p.parse_args(argv)

    anchors_map = read_bin_mat(
        os.path.join(args.result_folder, "anchors_map.bin"))
    anchors = read_anchors(os.path.join(args.result_folder, "anchors.bin"))
    print(f"{anchors.shape[0]} weak pixels, {anchors.shape[1]} anchors each")

    if args.point:
        x, y = (int(v) for v in args.point.split(","))
        a = anchors_of_pixel(anchors_map, anchors, x, y)
        if a is None:
            print(f"({x}, {y}) is not a weak pixel")
            return 1
        print(f"anchors of ({x}, {y}):")
        for k in range(a.shape[0]):
            print(f"  [{k}] ({a[k, 0]}, {a[k, 1]})")
        if args.out:
            if args.image:
                img = read_image_color(args.image)
            else:
                img = np.full(anchors_map.shape + (3,), 32, np.uint8)
            write_image(args.out, render_overlay(img, a, (x, y)))
            print(f"overlay -> {args.out}")
        return 0

    if args.interactive:
        import matplotlib.pyplot as plt
        img = read_image_color(args.image)[..., ::-1] if args.image else \
            np.full(anchors_map.shape + (3,), 32, np.uint8)
        fig, ax = plt.subplots()
        ax.imshow(img)

        def on_click(event):
            if event.xdata is None:
                return
            x, y = int(event.xdata), int(event.ydata)
            a = anchors_of_pixel(anchors_map, anchors, x, y)
            ax.clear()
            ax.imshow(img)
            if a is not None:
                ax.scatter([x], [y], c="red", s=20)
                valid = a[1:][(a[1:, 0] >= 0)]
                ax.scatter(valid[:, 0], valid[:, 1], c="lime", s=12)
            fig.canvas.draw_idle()

        fig.canvas.mpl_connect("button_press_event", on_click)
        plt.show()
    return 0


if __name__ == "__main__":
    sys.exit(main())
