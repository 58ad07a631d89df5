"""Structured Streaming extensions (optional surface — the reference is
micro-batch only, SURVEY §2.9; this is the §7.5 streaming variant)."""
