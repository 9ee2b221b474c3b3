"""Operator library: search (kNN), store (CRUD), dedup, similarity join.

Each operator is a DataFrame-in/DataFrame-out function — a logical-plan
builder.  Catalyst owns the physical strategy; operators only add hints
(broadcast) where the optimizer can't know the intent.
"""
