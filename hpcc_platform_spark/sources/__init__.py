"""Sources & sinks (SURVEY.md §2.1): file formats with ECL-dialect options,
index build/read, superfiles, inline tables, PIPE, workunit results."""

from hpcc_platform_spark.sources.fixedwidth import (
    FixedField,
    FixedLayout,
    read_fixed_width,
    write_fixed_width,
)
from hpcc_platform_spark.sources.files import (
    read_csv,
    read_json,
    read_superfile,
    read_xml,
    write_csv,
    write_json,
    write_parquet,
)
from hpcc_platform_spark.sources.index import build_index, read_index
from hpcc_platform_spark.sources.inline import inline_dataset
from hpcc_platform_spark.sources.pipe import pipe_through
from hpcc_platform_spark.sources.superfile import SuperFileCatalog
from hpcc_platform_spark.sources.translate import read_translated
from hpcc_platform_spark.sources.results import WorkunitResults

__all__ = [
    "FixedField",
    "FixedLayout",
    "WorkunitResults",
    "build_index",
    "inline_dataset",
    "pipe_through",
    "read_csv",
    "read_fixed_width",
    "read_index",
    "read_json",
    "read_superfile",
    "read_translated",
    "SuperFileCatalog",
    "read_xml",
    "write_csv",
    "write_fixed_width",
    "write_json",
    "write_parquet",
]
