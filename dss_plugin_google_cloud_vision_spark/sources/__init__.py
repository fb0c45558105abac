"""Sources and sinks: the synthetic Common-Crawl-style pages table
(deterministic datagen, parquet/Iceberg IO), per FIXTURES.md §1."""
