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


def fetch_image(image: Any, image_type: str = "Image"):
    """Load an image from path / http(s) url / file:// / data:base64 / s3:// /
    ndarray / PIL.Image.  Returns a PIL image (RGB), or a base64 data URL when
    ``image_type == "base64"``."""
    from PIL import Image

    if image is None:
        return None

    image_obj = None
    if isinstance(image, Image.Image):
        image_obj = image
    elif isinstance(image, np.ndarray):
        image_obj = Image.fromarray(image.astype("uint8"))
    elif isinstance(image, str):
        if image.startswith(("http://", "https://")):
            import requests

            image_obj = Image.open(requests.get(image, stream=True).raw)
        elif image.startswith("file://"):
            image_obj = Image.open(image[7:])
        elif image.startswith("data:image"):
            if "base64," in image:
                _, b64 = image.split("base64,", 1)
                image_obj = Image.open(BytesIO(base64.b64decode(b64)))
        elif image.startswith("s3://"):
            try:
                import boto3

                bucket, key = image[5:].split("/", 1)
                body = boto3.client("s3").get_object(Bucket=bucket, Key=key)["Body"].read()
                image_obj = Image.open(BytesIO(body))
            except ImportError as e:
                raise ValueError("boto3 is required for s3:// image refs.") from e
            except Exception as e:
                raise ValueError(f"Failed to fetch image from S3: {e}") from e
        else:
            image_obj = Image.open(image)
    if image_obj is None:
        raise ValueError(
            f"Unrecognized image input; supported: local path, http url, base64, s3, PIL.Image. Got {image!r}"
        )
    image_obj = image_obj.convert("RGB")
    if image_type == "base64":
        buf = BytesIO()
        image_obj.save(buf, format="PNG")
        return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode("utf-8")
    return image_obj


def show_safe_mode(estimated_cost: Any, estimated_LM_calls: Any) -> None:
    """Print a pre-flight cost estimate and give the user 5 s to abort."""
    print(f"Estimated cost: {estimated_cost} tokens")
    print(f"Estimated LM calls: {estimated_LM_calls}")
    try:
        for i in range(5, 0, -1):
            print(f"Proceeding execution in {i} seconds... Press CTRL+C to cancel", end="\r")
            time.sleep(1)
            print(" " * 60, end="\r")
        print("\n")
    except KeyboardInterrupt:
        print("\nExecution cancelled by user")
        raise SystemExit(0)
