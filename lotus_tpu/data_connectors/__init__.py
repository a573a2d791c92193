from lotus_tpu.data_connectors.connectors import DataConnector

__all__ = ["DataConnector"]
