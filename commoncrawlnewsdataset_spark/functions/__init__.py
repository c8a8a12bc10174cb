"""Scalar / vectorized column functions.

Everything here is either a native Column expression (JVM-side, whole-stage
codegen) or an Arrow-batched pandas UDF — never row-at-a-time Python UDFs
(the reference's `Series.apply` / `iterrows` loops are the slow path this
package replaces, per BASELINE.json input_hint).
"""
