"""Relational/dataflow operators: candidate joins, verification, clustering, top-k,
metrics. Everything is declarative DataFrame composition — Catalyst plans, AQE
re-plans, and the only Python is in Arrow-batched UDFs upstream."""
