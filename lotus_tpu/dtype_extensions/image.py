"""Pandas extension dtype for image references.

Functional counterpart of the reference's ImageDtype/ImageArray
(``lotus/dtype_extensions/image.py:12-327``): a column stores image *refs*
(path / url / s3 / base64 / PIL.Image / ndarray), fetches lazily with a
per-index cache, and compares by pixel content.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
from pandas.api.extensions import ExtensionArray, ExtensionDtype

from lotus_tpu.utils import fetch_image


class ImageDtype(ExtensionDtype):
    name = "image"
    type = object
    na_value = None

    @classmethod
    def construct_array_type(cls):
        return ImageArray


_IMAGE_DTYPE = ImageDtype()


class ImageArray(ExtensionArray):
    """Stores image references; loads pixels lazily with an index cache."""

    def __init__(self, values: Any):
        self._refs = np.asarray(values, dtype=object)
        self._pixels: dict[tuple[int, str], Any] = {}

    # ------------------------------------------------------------- indexing
    def __getitem__(self, item):
        picked = self._refs[item]
        return picked if isinstance(item, (int, np.integer)) else ImageArray(picked)

    def __setitem__(self, key, value) -> None:
        if isinstance(key, (int, np.integer)):
            self._refs[key] = value
            # Cache keys are (idx, image_type) tuples — drop every rendering
            # of this index.
            self._pixels = {k: v for k, v in self._pixels.items() if k[0] != int(key)}
        else:
            self._refs[key] = value
            self._pixels.clear()

    # --------------------------------------------------------------- images
    def get_image(self, idx: int, image_type: str = "Image"):
        """Fetch (and cache) the image at position idx."""
        key = (int(idx), image_type)
        if key not in self._pixels:
            self._pixels[key] = fetch_image(self._refs[idx], image_type)
        return self._pixels[key]

    # ------------------------------------------------------------ protocol
    def isna(self) -> np.ndarray:
        return np.array([v is None for v in self._refs], dtype=bool)

    def take(self, indices, allow_fill: bool = False, fill_value=None) -> "ImageArray":
        from pandas.core.algorithms import take

        result = take(self._refs, indices, allow_fill=allow_fill, fill_value=fill_value)
        return ImageArray(result)

    def copy(self) -> "ImageArray":
        return ImageArray(self._refs.copy())

    @classmethod
    def _concat_same_type(cls, to_concat: Sequence["ImageArray"]) -> "ImageArray":
        return cls(np.concatenate([arr._refs for arr in to_concat]))

    @classmethod
    def _from_sequence(cls, scalars, dtype=None, copy: bool = False):
        data = np.asarray(scalars, dtype=object)
        return cls(data.copy() if copy else data)

    def __len__(self) -> int:
        return len(self._refs)

    def __eq__(self, other) -> np.ndarray:  # type: ignore[override]
        if isinstance(other, ImageArray):
            if len(self) != len(other):
                return np.zeros(len(self), dtype=bool)
            return np.array(
                [_compare_images(self.get_image(i), other.get_image(i)) for i in range(len(self))],
                dtype=bool,
            )
        if isinstance(other, (list, np.ndarray)) and len(other) == len(self):
            return np.array(
                [_compare_images(self.get_image(i), fetch_image(o)) for i, o in enumerate(other)],
                dtype=bool,
            )
        return np.array([_compare_images(self.get_image(i), fetch_image(other)) for i in range(len(self))])

    @property
    def dtype(self) -> ImageDtype:
        return _IMAGE_DTYPE

    @property
    def nbytes(self) -> int:
        return self._refs.nbytes

    def __repr__(self) -> str:
        return f"ImageArray({self._refs!r})"

    def _formatter(self, boxed: bool = False):
        return lambda x: f"<image: {x!r}>" if x is not None else "None"

    def to_numpy(self, dtype=None, copy: bool = False, na_value=None) -> np.ndarray:
        out = self._refs
        if copy:
            out = out.copy()
        return out

    def __array__(self, dtype=None, copy=None) -> np.ndarray:
        return np.asarray(self._refs, dtype=object)


def _compare_images(img1: Any, img2: Any) -> bool:
    if img1 is None or img2 is None:
        return img1 is img2
    try:
        a = np.asarray(img1)
        b = np.asarray(img2)
        return a.shape == b.shape and bool((a == b).all())
    except Exception:
        return bool(img1 == img2)
