"""Operator library: dedup, similarity search, text analysis, relational.

The training-data-pipeline operators a 100 TB corpus engine needs
(dedup/ANN/text-quality) plus the reference's relational operator
inventory (SURVEY §2) expressed over the driver testdata tables. Every
SQL-expressible operator ships a DuckDB oracle via entry_queries.
"""
