"""Query-plan layer: the relational operator corpus (driver-contract
queries + DuckDB oracles) and the end-to-end KG pipeline composition."""
