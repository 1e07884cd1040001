from .reader import (FastqReader, read_tuples, peek_first_record,
                     FastqBatch, skip_to_record)
from .writer import FastqWriter, build_records, build_records_annotated
from .names import add_dir, make_file_name, make_file_names

__all__ = [
    "FastqReader",
    "FastqBatch",
    "read_tuples",
    "skip_to_record",
    "peek_first_record",
    "FastqWriter",
    "build_records",
    "build_records_annotated",
    "add_dir",
    "make_file_name",
    "make_file_names",
]
