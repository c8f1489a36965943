"""Single-node pure-Python oracle crawler — the executable stand-in for the
(absent) reference implementation, per SURVEY.md §0 item 6.

Implementation lives in lectura/oracle.py so __spark_entry__ and the Spark
pipeline tests can import it as a package module; this file keeps the path
promised by the survey blueprint."""

from lectura.oracle import OracleResult, dedupe_frontier, run_oracle  # noqa: F401
