"""Scalar function library (SURVEY.md §2.9): the reference's Std.Str/Date/
Math/hash surface mapped onto pyspark.sql.functions.

Most ECL built-ins are 1:1 with F.* (the mapping tables in SURVEY §2.9);
this package holds the wrappers where semantics need glue: ECL date-int
codecs (Std.Date stores YYYYMMDD ints), hashing, and string edge cases.
"""

from hpcc_platform_spark.functions.collation import (
    collated,
    collated_sort,
    collation_name,
    compare_at_strength,
    locale_compare_ignore_case,
)
from hpcc_platform_spark.functions.dates import (
    date_to_int,
    int_to_date,
    time_to_int,
)
from hpcc_platform_spark.functions.hashing import ecl_hash32, ecl_hash64, ecl_hashcrc, ecl_hashmd5
from hpcc_platform_spark.functions.strings import (
    clean_spaces,
    edit_distance,
    find_replace,
    split_words,
    wild_match,
)

__all__ = [
    "clean_spaces",
    "collated",
    "collated_sort",
    "collation_name",
    "compare_at_strength",
    "date_to_int",
    "ecl_hash32",
    "ecl_hash64",
    "ecl_hashcrc",
    "ecl_hashmd5",
    "edit_distance",
    "find_replace",
    "int_to_date",
    "locale_compare_ignore_case",
    "split_words",
    "time_to_int",
    "wild_match",
]
