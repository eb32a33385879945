"""CSV scalar operations (F1–F3) for CDM change-feed repair.

Spark's ``multiLine``/quote-aware CSV reader covers the data path; these
driver-side utilities exist for parity with the reference's CSV helpers
(reference: src/Sources/CdmChangeFeedSource/Extensions/CsvOperations.cs:19-97,
table-driven goldens in test/Operations/CsvOperationsTests.cs:9-31) and for
pre-repairing malformed feeds before handing files to Spark.

Semantics (matching the reference's goldens):
- quoted fields lose their outer quotes; embedded delimiters survive
- empty fields parse as ``None``
- a line with unbalanced quotes raises ``ValueError``
- ``is_complete`` = the line has an even number of quotes (multi-line
  record detection)
- ``replace_quoted_newlines`` strips newlines only inside quoted fields
  (honoring ``""`` escapes) and drops all carriage returns
"""

from __future__ import annotations

import re

_QUOTED_FIELD_RE = re.compile(r'"[^"]*(?:""[^"]*)*"')


def parse_csv_line(line: str, header_count: int,
                   delimiter: str = ",") -> list[str | None]:
    """Split one CSV line into exactly ``header_count`` fields."""
    if not is_complete(line):
        raise ValueError(
            f"CSV line {line!r} with delimiter {delimiter!r} has mismatching "
            "field quotes"
        )
    result: list[str | None] = [None] * header_count
    buf: list[str] = []
    in_quotes = False
    field_index = 0
    for i in range(len(line) + 1):
        at_end = i == len(line)
        ch = delimiter if at_end else line[i]
        if not at_end and ch == '"':
            if not in_quotes and not buf:
                in_quotes = True  # opening quote of a quoted field
            elif in_quotes:
                in_quotes = False  # closing quote
            else:
                buf.append(ch)  # stray quote after close — keep verbatim
            continue
        if ch == delimiter and not in_quotes:
            if field_index < header_count:
                value = "".join(buf)
                result[field_index] = value if value else None
            field_index += 1
            buf = []
            continue
        if not at_end:
            buf.append(ch)
    if in_quotes:
        raise ValueError(
            f"CSV line {line!r} with delimiter {delimiter!r} has mismatching "
            "field quotes"
        )
    return result


def is_complete(csv_line: str) -> bool:
    """True when the line closes every quote it opens (record is whole)."""
    return csv_line.count('"') % 2 == 0


def replace_quoted_newlines(csv_text: str) -> str:
    """Remove newlines inside quoted fields and all carriage returns."""
    repaired = _QUOTED_FIELD_RE.sub(
        lambda m: m.group(0).replace("\n", ""), csv_text
    )
    return repaired.replace("\r", "")
