"""PySpark-native analytics engine with the query and data-processing
capabilities surveyed in SURVEY.md for Vitalitypi/HighSpeedRailwayBigDataSystem.

NOTE ON PROVENANCE: the reference checkout at /root/reference is empty
(SURVEY.md §0) — no file:line citations into it are possible. Every operator
here implements a row of SURVEY.md §2 (the declared query surface) over the
driver-generated TPC-H-ish corpus described in FIXTURES.md, using only public
Apache Spark 4.x APIs.

Layout:
    schemas.py    — explicit StructType per table + load helpers
    session.py    — configured SparkSession builder
    registry.py   — (name → query fn, name → oracle SQL) registration
    operators/    — relational surface (§2.1–§2.8): scans, filters, joins,
                    aggregates, windows, sorts, set ops, scalar functions
    sources/      — file-format round-trips & partitioned sinks (§2.1)
    functions/    — UDF/pandas-UDF surface (§2.10), text/vector helpers (§2.11)
    streaming/    — Structured Streaming operators (§2.9)
    plans/        — physical-plan assertions (explain capture)
"""

__version__ = "0.1.0"
