"""Column-level function library (all JVM-side built-ins — no Python
UDFs in any hot path; see each module's scale notes)."""
