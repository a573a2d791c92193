"""Misc utilities: the k-means cluster() factory (TPU-backed), image fetch,
safe-mode countdown.

The reference's ``cluster()`` (``lotus/utils.py:14-72``) trains
``faiss.Kmeans`` on vectors pulled from the index; here the same contract is
served by the XLA k-means trainer (``lotus_tpu/ops/kmeans.py``) so
``sem_cluster_by`` runs on TPU.
"""

from __future__ import annotations

import base64
import time
from io import BytesIO
from typing import Any, Callable

import numpy as np
import pandas as pd


def cluster(col_name: str, ncentroids: int) -> Callable[..., list[int]]:
    """Return a function that clusters a DataFrame column's indexed vectors.

    The returned callable reads the column's vectors from the configured
    vector store (settings.vs) and runs the TPU k-means trainer, returning a
    cluster id per row.
    """

    def ret(
        df: pd.DataFrame,
        niter: int = 20,
        verbose: bool = False,
        method: str = "kmeans",
    ) -> list[int]:
        import jax
        import jax.numpy as jnp

        from lotus_tpu.ops.kmeans import kmeans_fit
        from lotus_tpu.settings import settings

        if col_name not in df.columns:
            raise ValueError(f"Column {col_name} not found in DataFrame")
        if ncentroids > len(df):
            raise ValueError(
                f"Number of centroids must be less than number of documents. {ncentroids} > {len(df)}"
            )

        rm, vs = settings.rm, settings.vs
        if rm is None or vs is None:
            raise ValueError(
                "Configure a retrieval model (rm) and vector store (vs) via "
                "lotus_tpu.settings.configure() before clustering."
            )

        try:
            col_index_dir = df.attrs["index_dirs"][col_name]
        except KeyError:
            raise ValueError(f"Index directory for column {col_name} not found in DataFrame")

        if vs.index_dir != col_index_dir:
            vs.load_index(col_index_dir)

        # df integer index positions correspond to vector row ids (same
        # contract as the reference, sem_index.py:63-65).
        ids = df.index.tolist()
        vec_set = vs.get_vectors_from_index(col_index_dir, ids)
        res = kmeans_fit(
            jnp.asarray(np.asarray(vec_set, dtype=np.float32)),
            ncentroids,
            iters=niter,
            key=jax.random.PRNGKey(0),
        )
        return np.asarray(res.assignments).tolist()

    return ret


# --------------------------------------------------------------- image refs
def _open_http(ref: str):
    import requests
    from PIL import Image

    return Image.open(requests.get(ref, stream=True).raw)


def _open_file_url(ref: str):
    from PIL import Image

    return Image.open(ref[len("file://"):])


def _open_data_url(ref: str):
    from PIL import Image

    if "base64," not in ref:
        return None
    payload = ref.split("base64,", 1)[1]
    return Image.open(BytesIO(base64.b64decode(payload)))


def _open_s3(ref: str):
    from PIL import Image

    try:
        import boto3
    except ImportError as exc:
        raise ValueError("boto3 is required for s3:// image refs.") from exc
    try:
        bucket, key = ref[len("s3://"):].split("/", 1)
        blob = boto3.client("s3").get_object(Bucket=bucket, Key=key)["Body"].read()
        return Image.open(BytesIO(blob))
    except Exception as exc:
        raise ValueError(f"Failed to fetch image from S3: {exc}") from exc


_IMAGE_SCHEMES: list[tuple[tuple[str, ...], Callable[[str], Any]]] = [
    (("http://", "https://"), _open_http),
    (("file://",), _open_file_url),
    (("data:image",), _open_data_url),
    (("s3://",), _open_s3),
]


def fetch_image(image: Any, image_type: str = "Image"):
    """Load an image from path / http(s) url / file:// / data:base64 / s3:// /
    ndarray / PIL.Image.  Returns a PIL image (RGB), or a base64 data URL when
    ``image_type == "base64"``."""
    from PIL import Image

    if image is None:
        return None

    loaded = None
    if isinstance(image, Image.Image):
        loaded = image
    elif isinstance(image, np.ndarray):
        loaded = Image.fromarray(image.astype("uint8"))
    elif isinstance(image, str):
        opener = next(
            (fn for prefixes, fn in _IMAGE_SCHEMES if image.startswith(prefixes)),
            Image.open,  # bare string: treat as a local path
        )
        loaded = opener(image)
    if loaded is None:
        raise ValueError(
            f"Unrecognized image input; supported: local path, http url, base64, s3, PIL.Image. Got {image!r}"
        )

    loaded = loaded.convert("RGB")
    if image_type != "base64":
        return loaded
    buf = BytesIO()
    loaded.save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode("utf-8")


def show_safe_mode(estimated_cost: Any, estimated_LM_calls: Any) -> None:
    """Print a pre-flight cost estimate and give the user 5 s to abort."""
    print(f"Estimated cost: {estimated_cost} tokens")
    print(f"Estimated LM calls: {estimated_LM_calls}")
    try:
        remaining = 5
        while remaining:
            print(f"Proceeding execution in {remaining} seconds... Press CTRL+C to cancel", end="\r")
            time.sleep(1)
            print(" " * 60, end="\r")
            remaining -= 1
        print("\n")
    except KeyboardInterrupt:
        print("\nExecution cancelled by user")
        raise SystemExit(0)
