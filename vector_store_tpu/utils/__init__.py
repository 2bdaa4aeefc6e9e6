"""Cross-cutting utilities: native bindings, tracing (SURVEY §5)."""
