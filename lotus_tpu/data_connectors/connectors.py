"""External data sources: SQL databases and S3-compatible object stores.

Role parity with ``lotus/data_connectors/connectors.py``. Both backends are
optional extras (SQLAlchemy / boto3) imported lazily; object payloads decode
through the :data:`_DECODERS` extension table, so new formats are one entry.
"""

from __future__ import annotations

from io import BytesIO, StringIO
from typing import Callable, Optional

import pandas as pd


def _optional(module: str, feature: str):
    """Import an optional dependency, or explain which extra is missing."""
    import importlib

    try:
        return importlib.import_module(module)
    except ImportError as e:
        raise ImportError(f"The '{module}' library is required for {feature}.") from e


def _text(raw: bytes) -> StringIO:
    return StringIO(raw.decode("utf-8"))


_DECODERS: dict[str, Callable[[bytes], pd.DataFrame]] = {
    "csv": lambda raw: pd.read_csv(_text(raw)),
    "txt": lambda raw: pd.read_csv(_text(raw), sep="\t"),
    "json": lambda raw: pd.read_json(_text(raw)),
    "parquet": lambda raw: pd.read_parquet(BytesIO(raw)),
    "xlsx": lambda raw: pd.read_excel(BytesIO(raw)),
}


def _decode_object(raw: bytes, file_path: str) -> pd.DataFrame:
    suffix = file_path.rsplit(".", 1)[-1].lower()
    decoder = _DECODERS.get(suffix)
    if decoder is None:
        raise ValueError(f"Unsupported file type: {suffix}")
    try:
        return decoder(raw)
    except Exception as e:
        raise ValueError(f"Error loading from S3-compatible service: {e}")


class DataConnector:
    @staticmethod
    def load_from_db(connection_url: str, query: str) -> pd.DataFrame:
        """Run a SQL query through SQLAlchemy and return the result frame."""
        sqlalchemy = _optional("sqlalchemy", "load_from_db")
        try:
            with sqlalchemy.create_engine(connection_url).connect() as conn:
                return pd.read_sql(query, conn)
        except sqlalchemy.exc.OperationalError as e:
            raise ValueError(f"Error connecting to database: {e}")

    @staticmethod
    def load_from_s3(
        aws_access_key: Optional[str], aws_secret_key: Optional[str],
        region: str, bucket: str, file_path: str,
        endpoint_url: Optional[str] = None, protocol: str = "s3",
    ) -> pd.DataFrame:
        """Fetch one object from S3/minio/R2; format chosen by extension.

        With both keys ``None`` the default credential chain is used.
        ``region`` only applies to real AWS S3 (ignored for custom endpoints).
        """
        boto3 = _optional("boto3", "load_from_s3")

        anonymous_chain = aws_access_key is None and aws_secret_key is None
        on_aws = protocol == "s3" and endpoint_url is None
        if anonymous_chain:
            session_kwargs = dict(region_name=region)
        else:
            session_kwargs = dict(
                aws_access_key_id=aws_access_key,
                aws_secret_access_key=aws_secret_key,
                region_name=region if on_aws else None,
            )
        try:
            session = boto3.Session(**session_kwargs)
        except Exception as e:
            raise ValueError(f"Error creating boto3 session: {e}")

        store = session.resource("s3", endpoint_url=endpoint_url)
        raw = store.Bucket(bucket).Object(file_path).get()["Body"].read()
        return _decode_object(raw, file_path)
