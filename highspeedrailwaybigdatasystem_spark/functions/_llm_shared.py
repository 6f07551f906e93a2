"""Shared building blocks for the LLM-pipeline operator family modules
(llm_dedup / llm_ann / llm_text / llm_mix / llm_mm — split from the
original single functions/llm.py in round 16 per the r15 verdict task #7;
registry names and registration order are unchanged).

Embeddings are L2-normalized (FIXTURES.md §2), so cosine ≡ dot product;
the oracle-side dot is this module's ``_DOT_ORACLE`` DuckDB fragment.
"""

from __future__ import annotations

_DOT_ORACLE = (
    "list_aggregate(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
)
