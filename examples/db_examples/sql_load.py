"""DataConnector: load DataFrames from SQL databases (and S3-compatible
stores with boto3)."""

from lotus_tpu.data_connectors import DataConnector

try:
    df = DataConnector.load_from_db("sqlite:///:memory:", "SELECT 1 AS one, 'hi' AS greeting")
    print(df)
except ImportError:
    print("Install sqlalchemy to run this example: pip install sqlalchemy")

# S3 / minio / R2:
# DataConnector.load_from_s3(None, None, "us-east-1", "my-bucket", "data.parquet")
