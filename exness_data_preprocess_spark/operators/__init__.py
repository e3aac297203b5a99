"""Operator layer: Spark-first re-expressions of the reference's relational
operators (SURVEY.md §2) plus large-scale training-data operators."""
