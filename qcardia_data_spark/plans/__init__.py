"""Plan layer: declarative pipeline spec → DataFrame DAG compiler,
content-addressed materialization (cache), and split routing.

Mirrors the reference's config-driven lifecycle (SURVEY §3.1): parse spec →
resolve split → fingerprint plan → materialize (or cache-hit) → serve.
"""
