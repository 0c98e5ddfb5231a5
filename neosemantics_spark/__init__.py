"""neosemantics_spark — PySpark-native knowledge-graph construction with
the data-processing surface of neosemantics (n10s), re-designed for
Spark's execution model. See README.md / OPERATORS.md."""

__version__ = "0.3.0"  # round-numbered: bumped once per build round


def version() -> str:
    """n10s.version analogue (n10s/Version.java)."""
    return __version__
