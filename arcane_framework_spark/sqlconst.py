"""Shared DuckDB-oracle SQL literals for the tokenizer contract.

Every catalog oracle that tokenizes ``documents.text`` must use the SAME
whitespace-split / punctuation-class definition as the Spark-side
tokenizer (``operators/text.py``); a drift between two copies of the
literal would surface as an oracle hash mismatch, but a single
definition removes the class of bug outright. Imported by queries.py,
queries_ext.py, and queries_pipeline.py — do not re-declare these.
"""

from __future__ import annotations

#: DuckDB expression producing the whitespace token list of ``text`` —
#: must match ``operators.text._with_tokens``'s Spark split exactly.
#: (``string_split_regex`` and ``regexp_split_to_array`` are DuckDB
#: aliases of the same function; this is the canonical spelling.)
TOKS_SQL = r"string_split_regex(lower(trim(text)), '\s+')"

#: DuckDB regex character class of the punctuation the quality score
#: counts ('' = escaped single quote inside a SQL string literal).
SQL_PUNCT_CLASS = "[.,;:!?''\"()-]"
