"""Reusable column-expression packs (JVM-side, codegen-friendly)."""
