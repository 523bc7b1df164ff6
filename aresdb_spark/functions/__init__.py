"""Scalar function extensions: geo predicates, HLL sketches.

Importing ``aresdb_spark.functions.geo`` registers
``geography_intersects`` into the AQL expression whitelist.
"""
