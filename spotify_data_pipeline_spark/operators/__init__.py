"""Composed operators built on DataFrame primitives (no custom Catalyst
rules needed — SURVEY.md §4.1: every operator is expressible as a
composition that Catalyst then optimizes)."""
