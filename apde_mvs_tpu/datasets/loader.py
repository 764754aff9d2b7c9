"""Scene layout resolution (reference: scripts/dataset_loader.py).

Scans may keep images under alternate directories (e.g. ``undist/images``)
or with mixed suffixes; this module discovers the real image directory and
materializes the canonical ``images/`` alias (symlink) the engine expects.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterable, List, Optional, Sequence


def _normalize_suffixes(suffixes: Iterable[str]) -> List[str]:
    out = []
    for s in suffixes:
        if not s:
            continue
        s = s.lower()
        out.append(s if s.startswith(".") else "." + s)
    return out


@dataclasses.dataclass
class DatasetLayoutConfig:
    image_dir_candidates: Sequence[str] = ("images", "undist/images")
    image_suffixes: Sequence[str] = (".jpg", ".jpeg", ".png")
    target_dir_name: str = "images"
    create_symlink: bool = True

    def normalized_suffixes(self) -> List[str]:
        return _normalize_suffixes(self.image_suffixes)


class SceneDatasetLoader:
    def __init__(self, scan_dir: str,
                 config: Optional[DatasetLayoutConfig] = None):
        self.scan_dir = os.path.abspath(scan_dir)
        self.config = config or DatasetLayoutConfig()
        self._image_dir: Optional[str] = None

    def resolve_image_dir(self) -> str:
        if self._image_dir:
            return self._image_dir
        for cand in self.config.image_dir_candidates:
            parts = [p for p in cand.split("/") if p]
            path = os.path.join(self.scan_dir, *parts)
            if os.path.isdir(path):
                self._image_dir = path
                return path
        raise FileNotFoundError(
            f"no image directory among {self.config.image_dir_candidates} "
            f"under {self.scan_dir}")

    def ensure_standard_image_dir(self) -> str:
        source = self.resolve_image_dir()
        canonical = os.path.join(self.scan_dir, self.config.target_dir_name)
        if os.path.isdir(canonical):
            return canonical
        if os.path.exists(canonical):
            raise FileExistsError(f"{canonical} exists but is not a directory")
        if not self.config.create_symlink:
            raise FileNotFoundError(
                f"{canonical} missing and symlink creation disabled")
        os.symlink(source, canonical)
        return canonical

    def list_images(self) -> List[str]:
        image_dir = self.resolve_image_dir()
        suffixes = self.config.normalized_suffixes()
        images = [e for e in os.listdir(image_dir)
                  if os.path.isfile(os.path.join(image_dir, e))
                  and os.path.splitext(e)[1].lower() in suffixes]
        images.sort()
        return images

    def count_images(self) -> int:
        return len(self.list_images())

    def has_standard_layout(self) -> bool:
        canonical = os.path.join(self.scan_dir, self.config.target_dir_name)
        if not os.path.isdir(canonical):
            return False
        try:
            return os.path.samefile(self.resolve_image_dir(), canonical)
        except FileNotFoundError:
            return False
