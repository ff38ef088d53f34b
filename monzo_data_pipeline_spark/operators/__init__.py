"""Relational operators (SURVEY.md §2.A / §2.B), one tested function each.

Every operator here is a pure DataFrame→DataFrame function built from
built-in pyspark.sql.functions only — zero Python UDFs (SURVEY.md §2
"UDF surface: none"), so the whole layer stays inside Catalyst
optimization and Tungsten whole-stage codegen.
"""
