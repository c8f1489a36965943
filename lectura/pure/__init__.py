"""Pure-Python spec layer: shared verbatim by the Spark UDFs and the
single-node oracle crawler (tests/oracle_crawler.py). No Spark imports
allowed in this subpackage. These functions ARE the byte-exactness spec
(SEMANTICS.md §1, §6, §9; B:15)."""
