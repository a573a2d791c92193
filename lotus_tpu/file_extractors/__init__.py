from lotus_tpu.file_extractors.directory_reader import DirectoryReader, Document
from lotus_tpu.file_extractors.pptx import PptxReader

__all__ = ["DirectoryReader", "Document", "PptxReader"]
