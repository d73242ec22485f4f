"""Scalar/array/text functions (SURVEY §2.9) and [ext] training-data
pipeline operators (§2.14): dedup, similarity search, text analysis.

Everything elementwise is a higher-order SQL function (JVM-side, codegen);
Python appears only in clearly-marked pandas-UDF paths for genuinely
non-relational math.
"""
