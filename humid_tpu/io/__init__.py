from .reader import FastqReader, read_tuples, peek_first_record, FastqBatch
from .writer import FastqWriter
from .names import add_dir, make_file_name, make_file_names

__all__ = [
    "FastqReader",
    "FastqBatch",
    "read_tuples",
    "peek_first_record",
    "FastqWriter",
    "add_dir",
    "make_file_name",
    "make_file_names",
]
