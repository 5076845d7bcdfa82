"""Reusable composite operators (as-of joins, top-k, dedup, similarity).

Each operator is a DataFrame→DataFrame function built from declarative
Spark primitives so Catalyst keeps optimizing through it; none of them
materialize on the driver.
"""
