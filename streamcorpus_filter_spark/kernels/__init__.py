"""Pure Python/numpy compute kernels — NO Spark imports.

These are the engine's "physical operators" for the parts Spark can't
express natively. Each kernel is (a) importable by the row-at-a-time
oracle for parity tests, (b) wrapped by a vectorized pandas UDF in
``functions/``. Keeping them Spark-free makes them unit-testable in
milliseconds and guarantees oracle/pipeline share spec, not plumbing.
"""
