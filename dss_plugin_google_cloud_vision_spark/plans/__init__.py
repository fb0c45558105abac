"""Pipeline assemblies: end-to-end extraction plans built from the
operators, mirroring the reference's five recipes as Spark dataflows."""
