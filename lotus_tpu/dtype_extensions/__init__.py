"""Pandas extension dtypes (images) and payload coercion helpers."""

from typing import Union

import pandas as pd

from lotus_tpu.dtype_extensions.image import ImageArray, ImageDtype

pd.api.extensions.register_extension_dtype(ImageDtype)


def convert_to_base_data(data: Union[pd.Series, list]) -> list:
    """Coerce a Series (possibly image-typed) or list to base python values."""
    if not isinstance(data, pd.Series):
        return data
    if isinstance(data.dtype, ImageDtype):
        return [data.array.get_image(pos) for pos in range(len(data))]
    return data.tolist()


__all__ = ["ImageDtype", "ImageArray", "convert_to_base_data"]
