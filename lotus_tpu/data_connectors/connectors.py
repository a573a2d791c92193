"""External data connectors: SQL databases and S3-compatible object stores.

Parity target: ``lotus/data_connectors/connectors.py:10-87``.  SQLAlchemy and
boto3 are optional; file format is chosen by extension
(csv/json/parquet/xlsx/txt).
"""

from __future__ import annotations

from io import BytesIO, StringIO
from typing import Optional

import pandas as pd


class DataConnector:
    @staticmethod
    def load_from_db(connection_url: str, query: str) -> pd.DataFrame:
        """Execute a SQL query via SQLAlchemy and return a DataFrame."""
        try:
            from sqlalchemy import create_engine
            from sqlalchemy.exc import OperationalError
        except ImportError as e:
            raise ImportError("The 'sqlalchemy' library is required for load_from_db.") from e
        try:
            engine = create_engine(connection_url)
            with engine.connect() as conn:
                return pd.read_sql(query, conn)
        except OperationalError as e:
            raise ValueError(f"Error connecting to database: {e}")

    @staticmethod
    def load_from_s3(
        aws_access_key: Optional[str],
        aws_secret_key: Optional[str],
        region: str,
        bucket: str,
        file_path: str,
        endpoint_url: Optional[str] = None,
        protocol: str = "s3",
    ) -> pd.DataFrame:
        """Load a DataFrame from S3/minio/R2; format by file extension."""
        try:
            import boto3
        except ImportError as e:
            raise ImportError("The 'boto3' library is required for load_from_s3.") from e

        try:
            if aws_access_key is None and aws_secret_key is None:
                session = boto3.Session(region_name=region)
            else:
                session = boto3.Session(
                    aws_access_key_id=aws_access_key,
                    aws_secret_access_key=aws_secret_key,
                    region_name=region if protocol == "s3" and endpoint_url is None else None,
                )
        except Exception as e:
            raise ValueError(f"Error creating boto3 session: {e}")

        s3 = session.resource("s3", endpoint_url=endpoint_url)
        data = s3.Bucket(bucket).Object(file_path).get()["Body"].read()

        loaders = {
            "csv": lambda b: pd.read_csv(StringIO(b.decode("utf-8"))),
            "json": lambda b: pd.read_json(StringIO(b.decode("utf-8"))),
            "parquet": lambda b: pd.read_parquet(BytesIO(b)),
            "xlsx": lambda b: pd.read_excel(BytesIO(b)),
            "txt": lambda b: pd.read_csv(StringIO(b.decode("utf-8")), sep="\t"),
        }
        ext = file_path.split(".")[-1].lower()
        try:
            return loaders[ext](data)
        except KeyError:
            raise ValueError(f"Unsupported file type: {ext}")
        except Exception as e:
            raise ValueError(f"Error loading from S3-compatible service: {e}")
