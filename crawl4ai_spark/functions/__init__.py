"""Column-expression and pandas-UDF building blocks.

Everything scoring/filtering-related is a *Column builder*: a small spec
object with ``.column(url_col) -> Column`` so Catalyst sees plain
expressions (whole-stage codegen) wherever parity allows; only URL
canonicalization — which must byte-match the reference's stdlib-based
normalizer — runs as an Arrow-vectorized pandas UDF.
"""
