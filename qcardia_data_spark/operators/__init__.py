"""Relational operator kernel (SURVEY.md §2.2-2.8, §2.10).

Pure built-in pyspark.sql expressions — every function here stays inside
whole-stage codegen; none drops to Python at execution time.
"""
