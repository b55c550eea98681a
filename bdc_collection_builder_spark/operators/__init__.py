"""Relational operator inventory (SURVEY §2) as reusable DataFrame ops."""
