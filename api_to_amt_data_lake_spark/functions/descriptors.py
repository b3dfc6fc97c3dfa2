"""Ed-Fi descriptor-URI and href parsing expressions.

Reference semantics (SURVEY.md §2.7):
- F1 `get_descriptor_code_value_from_uri` — reference
  `parquet/Common/pandasWrapper.py:175-185`: ``split('#')[-1]``.
- F2 descriptor name — reference `parquet/Common/descriptor_mapping.py:47-51`:
  ``split('#')[-2]`` then ``split('/')[-1]``.
- F3 href → reference id — reference `parquet/Common/pandasWrapper.py:188-195`:
  ``split('/')[-1]``.

All implemented with `substring_index` (JVM intrinsic, codegen-friendly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def descriptor_code_value(c: Column | str) -> Column:
    """`uri://ed-fi.org/GradeLevelDescriptor#Ninth grade` -> `Ninth grade`.

    Matches pandas ``str.split('#')[-1]``: a value with no `#` passes
    through unchanged; nulls stay null.
    """
    return F.substring_index(_col(c), "#", -1)


def descriptor_name(c: Column | str) -> Column:
    """`uri://ed-fi.org/GradeLevelDescriptor#Ninth grade` -> `GradeLevelDescriptor`.

    split('#')[-2] (everything before the last '#') then split('/')[-1].
    """
    return F.substring_index(F.substring_index(_col(c), "#", 1), "/", -1)


def ref_from_href(c: Column | str) -> Column:
    """`.../ed-fi/schools/abc-123` -> `abc-123` (last path segment)."""
    return F.substring_index(_col(c), "/", -1)
