"""Loading DataFrames from S3-compatible object stores.

Mirrors the reference's s3.py (reference examples/db_examples/): one
connector call covers AWS S3, minio, R2 and public buckets — credentials
None selects the default chain / anonymous access.  Gated on boto3 +
configured credentials so the script runs offline.
"""

import os
import sys

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from examples._common import configure
from lotus_tpu.data_connectors import DataConnector

configure(lambda p, m, **kw: "Answer: True")

SERVICES = {
    "aws": dict(
        aws_access_key=os.getenv("AWS_ACCESS_KEY_ID"),
        aws_secret_key=os.getenv("AWS_SECRET_ACCESS_KEY"),
        region="us-east-1",
        bucket=os.getenv("LOTUS_TPU_S3_BUCKET", ""),
        file_path="data/test.csv",
    ),
    "minio": dict(
        aws_access_key="accesskey",
        aws_secret_key="secretkey",
        region=None,
        bucket="test-bucket",
        file_path="data/test.csv",
        protocol="http",
        endpoint_url="http://localhost:9000",
    ),
}

for name, cfg in SERVICES.items():
    if not cfg["bucket"]:
        print(f"{name} skipped: no bucket configured")
        continue
    try:
        df = DataConnector.load_from_s3(**cfg)
    except Exception as e:  # missing boto3 / creds / endpoint
        print(f"{name} skipped: {e}")
        continue
    print(name, df.head())
    print(df.sem_filter("{text} mentions a product defect"))
